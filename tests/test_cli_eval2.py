"""End-to-end executions of the ETH3D and TartanAir eval CLIs on fabricated
datasets (random weights) — including the test-split sweep with its
success-rate curve (reference evaluation_scripts/test_eth3d.py:58-105,
validate_tartanair.py:77-114)."""
import json
import os

import numpy as np
import pytest

from droid_slam_reserch_tpu.cli import main
from synth_scenes import (FAST_SLAM_FLAGS, make_eth3d_sequence,
                           make_tartanair_scene)


@pytest.mark.slow
def test_eth3d_cli_end_to_end(tmp_path, capsys):
    """RGB-D ETH3D protocol: calibration.txt intrinsics, depth/1000 scaling,
    area-preserving resize, groundtruth ATE (reference test_eth3d.py:25-118)."""
    seq = make_eth3d_sequence(tmp_path / "table_synth", n_frames=12)
    main(["eth3d", "--datapath", str(seq), "--depth", *FAST_SLAM_FLAGS])

    out = capsys.readouterr().out
    ate = None
    for line in out.splitlines():
        if line.strip().startswith("{"):
            d = json.loads(line)
            if "ate" in d:
                ate = d["ate"]
    assert ate is not None, "eth3d CLI printed no ATE JSON"
    assert np.isfinite(ate["rmse"])


@pytest.mark.slow
def test_tartanair_split_cli_end_to_end(tmp_path, capsys):
    """The validate_tartanair sweep: per-scene ATE + success-rate curve JSON
    (reference validate_tartanair.py:77-114)."""
    from droid_slam_reserch_tpu.data.tartan import TARTAN_TEST_SPLIT

    scene = TARTAN_TEST_SPLIT[0]
    make_tartanair_scene(os.path.join(tmp_path, scene), n_frames=12)
    out_json = tmp_path / "curve.json"
    main(["tartanair", "--datapath", str(tmp_path), "--split", "--id", "0",
          "--out", str(out_json), *FAST_SLAM_FLAGS])

    saved = json.loads(out_json.read_text())
    assert saved["scenes"] == 1
    assert np.isfinite(saved["mean_ate"])
    assert scene in saved["per_scene"]
    curve = saved["success_rate_curve"]
    fr = np.asarray(curve["fraction"])
    assert len(curve["thresholds"]) == len(fr)
    assert ((fr >= 0) & (fr <= 1)).all()
    # the curve is a CDF: nondecreasing in the threshold
    assert (np.diff(fr) >= 0).all()
