"""Live visualization consumer (reference droid.py:40-43 + visualization.py):
tracking with a LiveViewer attached produces an incrementally-updating PLY
without stalling the frontend."""
import os

import numpy as np

from droid_slam_reserch_tpu.engine import Droid
from droid_slam_reserch_tpu.engine.droid import init_params
from droid_slam_reserch_tpu.viz import LiveViewer

from tests.test_engine import INTR, make_config, run_sequence


def test_live_viewer_streams_pointcloud(tmp_path):
    out = str(tmp_path / "live.ply")
    cfg = make_config(vis_path=out)
    droid = Droid(cfg, params=init_params(make_config(), seed=0))
    assert droid.viewer is not None
    run_sequence(droid, 10)

    # force one synchronous drain so the test doesn't race the poll timer
    droid.viewer.refresh_once()
    droid.viewer._write()
    assert os.path.exists(out)
    n1 = len(droid.viewer.cloud()[0])
    refreshes = droid.viewer.refreshes
    assert refreshes >= 1

    # backend re-dirties every keyframe; the viewer picks the edits up and
    # replaces (not duplicates) per-keyframe geometry
    droid.terminate()
    assert droid.viewer.refreshes >= refreshes
    pts, clr = droid.viewer.cloud()
    assert len(pts) == len(clr)
    assert np.isfinite(pts).all()
    assert not np.asarray(droid.video.dirty[: droid.video.counter]).any()

    with open(out) as f:
        head = f.read(200)
    assert head.startswith("ply")
