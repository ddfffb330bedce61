"""End-to-end execution of the ETH3D eval CLI on a fabricated RGB-D
dataset (random weights; reference evaluation_scripts/test_eth3d.py:58-105)."""
import json
import os

import numpy as np
import pytest

from droid_slam_reserch_tpu.cli import main
from synth_scenes import FAST_SLAM_FLAGS, make_eth3d_sequence


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
