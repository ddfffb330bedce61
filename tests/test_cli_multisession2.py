"""The quality-gated ImproveAdjust recovery driver through its CLI
(`multisession-align --improve`): spec-JSON parsing, badT gating, and the
recovered-map output (reference Euroc_Multisession_Stereo/ImproveAdjust.py:
204-337)."""
import json

import numpy as np
import pytest

from droid_slam_reserch_tpu.cli import main
from synth_scenes import textured_image

FLAGS = ["--image_size", "64", "96", "--buffer", "32", "--warmup", "5",
         "--filter_thresh", "-1", "--keyframe_thresh", "0",
         "--frontend_window", "8", "--frontend_thresh", "32"]


def _make_imagedir(root, frames):
    import cv2

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for k, t in enumerate(frames):
        # name by position so the stream replays in the given order
        cv2.imwrite(str(root / f"{k:04d}.png"), textured_image(64, 96, t, rng))
    calib = root.parent / f"{root.name}_calib.txt"
    calib.write_text("60.0 60.0 48.0 32.0\n")
    return root, calib


@pytest.mark.slow
def test_multisession_align_improve_cli(tmp_path, capsys):
    # session A export (stage 1)
    imgdir, calib = _make_imagedir(tmp_path / "frames", list(range(12)))
    s0_dir = tmp_path / "s0"
    main(["demo", "--imagedir", str(imgdir), "--calib", str(calib),
          "--target_area", "6144", "--reconstruction_path", str(s0_dir),
          "--disable_backend", *FLAGS])

    # two loop groups: forward over frames 0..8 and reverse over 8..0 —
    # the fwd+rev pair ImproveAdjust stitches (reverse segment first)
    fwd_dir, fwd_calib = _make_imagedir(tmp_path / "fwd", list(range(9)))
    rev_dir, rev_calib = _make_imagedir(tmp_path / "rev",
                                        list(range(8, -1, -1)))
    spec = {"groups": [
        {"seed_idx": [0, 1, 2, 3, 4], "frame_idx": [5, 6, 7, 8],
         "imagedir": str(fwd_dir), "calib": str(fwd_calib), "name": "fwd"},
        {"seed_idx": [0, 1, 2, 3, 4], "frame_idx": [8, 7, 6, 5],
         "imagedir": str(rev_dir), "calib": str(rev_calib), "name": "rev"},
    ]}
    spec_file = tmp_path / "improve_spec.json"
    spec_file.write_text(json.dumps(spec))

    # impossible gate: every keyframe is "bad" -> no group accepted
    out_bad = tmp_path / "improve_bad"
    capsys.readouterr()
    main(["multisession-align", "--first", str(s0_dir / "reconstruction.npz"),
          "--spec", str(spec_file), "--out", str(out_bad), "--improve",
          "--quality_mean_thresh", "1e9", "--quality_min_thresh", "1e9",
          "--bad_limit", "2", *FLAGS])
    rep = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.strip().startswith("{")][-1])
    assert rep["recovered"] is False
    assert all(not g["accepted"] for g in rep["report"])
    assert not (out_bad / "recovered.npz").exists()

    # permissive gate: both groups accepted, stitched map written
    out_good = tmp_path / "improve_good"
    main(["multisession-align", "--first", str(s0_dir / "reconstruction.npz"),
          "--spec", str(spec_file), "--out", str(out_good), "--improve",
          "--quality_mean_thresh", "-1", "--quality_min_thresh", "-1",
          "--bad_limit", "4", *FLAGS])
    rep = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.strip().startswith("{")][-1])
    assert rep["recovered"] is True
    assert all(g["accepted"] for g in rep["report"])
    rec = dict(np.load(out_good / "recovered.npz", allow_pickle=True))
    assert len(rec["poses"]) > 0
    assert np.isfinite(rec["poses"]).all()
