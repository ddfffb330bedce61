"""Fabricated tiny datasets in each eval protocol's on-disk layout.

Used by the CLI end-to-end tests so every eval command in cli.py executes
against real files (reference layouts: evaluation_scripts/test_euroc.py:25-76,
test_tum.py:23-53, test_eth3d.py:25-56, validate_tartanair.py:18-37).
"""
import os

import numpy as np


def textured_image(H, W, t, rng):
    """Trackable moving texture (same recipe as the demo CLI test)."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = (
        127 + 80 * np.sin(0.2 * (xs + 6 * t)) * np.cos(0.15 * (ys + 3 * t))
        + 20 * rng.standard_normal((H, W))
    )
    return np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)


def _write_png(path, img):
    import cv2

    cv2.imwrite(str(path), img)


def make_euroc_sequence(root, n_frames=12, stereo=False):
    """<root>/mav0/{cam0,cam1}/data/<ns>.png at the raw 752x480 +
    state_groundtruth_estimate0/data.csv (comma, ns stamps, qw-first)."""
    rng = np.random.RandomState(0)
    t0, dt = 1403636579763555584, 50_000_000  # 20 Hz, EuRoC-era epoch
    mav0 = os.path.join(root, "mav0")
    os.makedirs(os.path.join(mav0, "cam0", "data"), exist_ok=True)
    if stereo:
        os.makedirs(os.path.join(mav0, "cam1", "data"), exist_ok=True)
    gt_dir = os.path.join(mav0, "state_groundtruth_estimate0")
    os.makedirs(gt_dir, exist_ok=True)

    rows = []
    for t in range(n_frames):
        ts = t0 + t * dt
        img = textured_image(480, 752, t, rng)
        _write_png(os.path.join(mav0, "cam0", "data", f"{ts}.png"), img)
        if stereo:
            _write_png(os.path.join(mav0, "cam1", "data", f"{ts}.png"), img)
        rows.append([ts, 0.05 * t, 0.01 * t, 0.0, 1.0, 0.0, 0.0, 0.0])
    gt_file = os.path.join(gt_dir, "data.csv")
    with open(gt_file, "w") as f:
        f.write("#timestamp [ns],p_x,p_y,p_z,q_w,q_x,q_y,q_z\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    return mav0, gt_file


def make_tum_sequence(root, n_frames=16):
    """<root>/rgb/<epoch>.png (640x480) + groundtruth.txt (TUM rows)."""
    rng = np.random.RandomState(1)
    t0, dt = 1305031102.175, 0.066
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    rows = []
    for t in range(n_frames):
        ts = t0 + t * dt
        _write_png(os.path.join(root, "rgb", f"{ts:.6f}.png"),
                   textured_image(480, 640, t, rng))
        rows.append([ts, 0.05 * t, 0.0, 0.01 * t, 0.0, 0.0, 0.0, 1.0])
    gt_file = os.path.join(root, "groundtruth.txt")
    np.savetxt(gt_file, np.asarray(rows))
    return root, gt_file


def make_eth3d_sequence(root, n_frames=12, with_depth=True):
    """<root>/{rgb,depth}/<stamp>.png + calibration.txt + groundtruth.txt."""
    rng = np.random.RandomState(2)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    if with_depth:
        os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    H, W = 120, 160
    np.savetxt(os.path.join(root, "calibration.txt"),
               np.array([100.0, 100.0, W / 2.0, H / 2.0])[None])
    rows = []
    for t in range(n_frames):
        ts = 100.0 + 0.1 * t
        _write_png(os.path.join(root, "rgb", f"{ts:.4f}.png"),
                   textured_image(H, W, t, rng))
        if with_depth:
            depth_mm = (2000 + 500 * rng.rand(H, W)).astype(np.uint16)
            _write_png(os.path.join(root, "depth", f"{ts:.4f}.png"), depth_mm)
        rows.append([ts, 0.04 * t, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    np.savetxt(os.path.join(root, "groundtruth.txt"), np.asarray(rows))
    return root


def make_tartanair_scene(scene_dir, n_frames=12, stereo=False,
                         with_depth=False):
    """<scene>/image_left/*.png (640x480) + pose_left.txt (NED rows)."""
    rng = np.random.RandomState(3)
    os.makedirs(os.path.join(scene_dir, "image_left"), exist_ok=True)
    if stereo:
        os.makedirs(os.path.join(scene_dir, "image_right"), exist_ok=True)
    if with_depth:
        os.makedirs(os.path.join(scene_dir, "depth_left"), exist_ok=True)
    poses = []
    for t in range(n_frames):
        img = textured_image(480, 640, t, rng)
        _write_png(os.path.join(scene_dir, "image_left", f"{t:06d}_left.png"), img)
        if stereo:
            _write_png(
                os.path.join(scene_dir, "image_right", f"{t:06d}_right.png"), img)
        if with_depth:
            np.save(os.path.join(scene_dir, "depth_left", f"{t:06d}.npy"),
                    (2.0 + 0.1 * rng.rand(480, 640)).astype(np.float32))
        poses.append([0.0, 0.1 * t, 0.0, 0.0, 0.0, 0.0, 1.0])
    np.savetxt(os.path.join(scene_dir, "pose_left.txt"),
               np.asarray(poses), delimiter=" ")
    return scene_dir


FAST_SLAM_FLAGS = [
    "--image_size", "64", "96", "--buffer", "32", "--warmup", "5",
    "--filter_thresh", "-1", "--keyframe_thresh", "0",
    "--frontend_window", "8", "--frontend_thresh", "32",
]
