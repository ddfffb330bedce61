"""End-to-end execution of the TartanAir test-split sweep CLI on a
fabricated scene — per-scene ATE + the success-rate curve (reference
evaluation_scripts/validate_tartanair.py:77-114).  Own file so the xdist
worker that runs it has a short compile history (see pytest.ini)."""
import json
import os

import numpy as np
import pytest

from droid_slam_reserch_tpu.cli import main
from synth_scenes import FAST_SLAM_FLAGS, make_tartanair_scene


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
