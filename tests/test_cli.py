"""App-level end-to-end test: the demo CLI on a synthetic image directory,
then point-cloud export of the saved reconstruction."""
import os

import numpy as np
import pytest

from droid_slam_reserch_tpu.cli import main


@pytest.mark.slow
def test_demo_cli_end_to_end(tmp_path):
    import cv2

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rng = np.random.RandomState(0)
    H, W = 64, 96
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for t in range(10):
        img = (
            127 + 80 * np.sin(0.2 * (xs + 6 * t)) * np.cos(0.15 * (ys + 3 * t))
            + 20 * rng.standard_normal((H, W))
        )
        img = np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)
        cv2.imwrite(str(imgdir / f"{t:04d}.png"), img)

    calib = tmp_path / "calib.txt"
    calib.write_text("60.0 60.0 48.0 32.0\n")
    recon = tmp_path / "recon"

    main([
        "demo", "--imagedir", str(imgdir), "--calib", str(calib),
        "--buffer", "32", "--warmup", "5", "--filter_thresh", "-1",
        "--keyframe_thresh", "0", "--frontend_window", "8",
        "--frontend_thresh", "32", "--target_area", "6144",
        "--reconstruction_path", str(recon),
    ])

    data = np.load(recon / "reconstruction.npz")
    assert data["poses"].shape[0] >= 5
    assert np.all(np.isfinite(data["poses"]))

    ply = tmp_path / "cloud.ply"
    main(["view", "--reconstruction", str(recon / "reconstruction.npz"),
          "--out", str(ply)])
    assert ply.exists()
    header = ply.read_text().splitlines()[:8]
    assert header[0] == "ply"
