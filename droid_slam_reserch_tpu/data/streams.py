"""Generic image streams (reference demo.py:47-78, data_readers/stream.py)."""
import os

import numpy as np


def resize_to_area(image, target_area=384 * 512):
    """Resize keeping aspect so h*w ~= target_area, crop to multiples of 8
    (reference demo.py:66-71).  Returns image, (sx, sy) scale factors."""
    import cv2

    h0, w0 = image.shape[:2]
    s = np.sqrt(target_area / (h0 * w0))
    h1, w1 = int(h0 * s), int(w0 * s)
    image = cv2.resize(image, (w1, h1))
    image = image[: h1 - h1 % 8, : w1 - w1 % 8]
    return image, (w1 / w0, h1 / h0)


def generic_image_stream(imagedir, calib, stride=1, target_area=384 * 512):
    """Calibrated image-directory stream (reference demo.py:47-78).

    calib: path to a text file "fx fy cx cy [k1 k2 p1 p2 k3]".
    """
    import cv2

    calib = np.loadtxt(calib, delimiter=" ").reshape(-1)
    fx, fy, cx, cy = calib[:4]
    K = np.eye(3)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = fx, cx, fy, cy

    image_list = sorted(os.listdir(imagedir))[::stride]
    for t, imfile in enumerate(image_list):
        image = cv2.imread(os.path.join(imagedir, imfile))
        if len(calib) > 4:
            image = cv2.undistort(image, K, calib[4:])
        image, (sx, sy) = resize_to_area(image, target_area)
        intrinsics = np.array([fx * sx, fy * sy, cx * sx, cy * sy], np.float32)
        yield t, image, intrinsics
