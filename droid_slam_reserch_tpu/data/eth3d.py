"""ETH3D RGB-D stream (reference test_eth3d.py:25-56)."""
import glob
import os

import numpy as np

from .streams import resize_to_area


def eth3d_stream(datapath, use_depth=False, stride=1, target_area=384 * 512):
    import cv2

    fx, fy, cx, cy = np.loadtxt(os.path.join(datapath, "calibration.txt")).tolist()
    image_list = sorted(glob.glob(os.path.join(datapath, "rgb", "*.png")))
    if not image_list:
        image_list = sorted(glob.glob(os.path.join(datapath, "color", "*.jpg")))
    depth_list = sorted(glob.glob(os.path.join(datapath, "depth", "*.png")))
    image_list = image_list[::stride]
    depth_list = depth_list[::stride]

    for t, image_file in enumerate(image_list):
        image = cv2.imread(image_file)
        h0, w0 = image.shape[:2]
        image, (sx, sy) = resize_to_area(image, target_area=target_area)
        intr = np.array([fx * sx, fy * sy, cx * sx, cy * sy], np.float32)

        if use_depth and t < len(depth_list):
            depth = cv2.imread(depth_list[t], cv2.IMREAD_ANYDEPTH) / 1000.0
            h1, w1 = image.shape[:2]
            depth = cv2.resize(depth, (w1, h1), interpolation=cv2.INTER_NEAREST)
            yield t, image, depth.astype(np.float32), intr
        else:
            yield t, image, intr


def eth3d_timestamps(datapath, stride=1):
    """Frame timestamps parsed from the rgb filenames (<stamp>.png)."""
    image_list = sorted(glob.glob(os.path.join(datapath, "rgb", "*.png")))
    if not image_list:
        image_list = sorted(glob.glob(os.path.join(datapath, "color", "*.jpg")))
    out = []
    for f in image_list[::stride]:
        stem = os.path.splitext(os.path.basename(f))[0]
        try:
            out.append(float(stem))
        except ValueError:
            out.append(float(len(out)))
    return out
