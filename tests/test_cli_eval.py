"""End-to-end executions of the EuRoC and TUM eval CLIs on fabricated
datasets (random weights): arg wiring, stream construction, rectification
plumbing, GT association and the trajectory/ATE outputs all run for real
(reference evaluation_scripts/test_euroc.py:79-145, test_tum.py:79-123)."""
import json

import numpy as np
import pytest

from droid_slam_reserch_tpu.cli import main
from synth_scenes import (FAST_SLAM_FLAGS, make_euroc_sequence,
                           make_tum_sequence)


def _last_json_with(capsys, key):
    out = capsys.readouterr().out
    found = None
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if key in d:
                found = d
    return found


@pytest.mark.slow
def test_euroc_cli_end_to_end(tmp_path, capsys):
    """Mono EuRoC protocol: rectification maps + resize + mono scale fudge +
    ns-timestamp GT association (reference test_euroc.py:123-145)."""
    mav0, gt_file = make_euroc_sequence(tmp_path / "MH_01_synth", n_frames=12)
    out = tmp_path / "traj.txt"
    recon = tmp_path / "recon"
    main(["euroc", "--datapath", mav0, "--gt", gt_file, "--out", str(out),
          "--reconstruction_path", str(recon), *FAST_SLAM_FLAGS])

    assert out.exists()
    traj = np.loadtxt(out)
    assert traj.shape == (12, 8) and np.isfinite(traj).all()
    # timestamps are the cam0 ns filenames
    assert traj[0, 0] > 1e18

    # multisession stage 1 rode along: session state + keyframe image dump
    state = np.load(recon / "reconstruction.npz")
    assert np.isfinite(state["poses"]).all()
    import os

    kf_dir = recon / "keyframes_cam0"
    assert kf_dir.is_dir() and len(os.listdir(kf_dir)) == len(state["poses"])

    res = _last_json_with(capsys, "ate")
    assert res is not None, "euroc CLI printed no ATE JSON"
    assert np.isfinite(res["ate"]["rmse"])
    assert res["ate"]["matches"] >= 3
    saved = json.loads((tmp_path / "traj.txt.ate.json").read_text())
    assert saved["rmse"] == res["ate"]["rmse"]


@pytest.mark.slow
def test_euroc_stereo_cli_end_to_end(tmp_path, capsys):
    """The stereo protocol: cam1 rectification maps, stacked stereo frames,
    no mono scale fudge, correct_scale off (reference test_euroc.py:34-76)."""
    mav0, gt_file = make_euroc_sequence(tmp_path / "MH_01_st", n_frames=10,
                                        stereo=True)
    main(["euroc", "--datapath", mav0, "--gt", gt_file, "--stereo",
          *FAST_SLAM_FLAGS])
    res = _last_json_with(capsys, "ate")
    assert res is not None, "stereo euroc CLI printed no ATE JSON"
    assert np.isfinite(res["ate"]["rmse"])


@pytest.mark.slow
def test_tum_cli_end_to_end(tmp_path, capsys):
    """TUM fr1 protocol: undistort + boundary crop + epoch-stamp GT
    association at stride 2 (reference test_tum.py:79-123)."""
    seq, gt_file = make_tum_sequence(tmp_path / "rgbd_dataset_synth",
                                     n_frames=16)
    main(["tum", "--datapath", str(seq), "--gt", gt_file, *FAST_SLAM_FLAGS])

    res = _last_json_with(capsys, "ate")
    assert res is not None, "tum CLI printed no ATE JSON"
    assert np.isfinite(res["ate"]["rmse"])
    assert res["ate"]["matches"] >= 3
