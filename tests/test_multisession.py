"""Multisession tests: group-sequence parsing, IQR alignment, map fusion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_reserch_tpu import lie
from droid_slam_reserch_tpu.multisession import (
    compute_filtered_mean,
    estimate_alignment,
    parse_group_sequence,
    transform_poses,
)


def test_parse_group_sequence(tmp_path):
    p = tmp_path / "GroupSequence.txt"
    p.write_text(
        "0\n"
        "First Images Series: 1 2 3 4\n"
        "Second Images Series: 10 11 12 [Order] \n"
        "Third Images Series: 20 21 22 [ReverseOrder] \n"
        "1\n"
        "First Images Series: 5 6 7\n"
    )
    data = parse_group_sequence(str(p))
    assert data[0][0] == [1, 2, 3, 4]
    assert data[0][1] == [10, 11, 12]
    assert data[0][2] == [22, 21, 20]  # reversed on read
    assert data[1][0] == [5, 6, 7]


def test_iqr_filtered_mean_rejects_outliers():
    rng = np.random.RandomState(0)
    rows = 1.0 + 0.01 * rng.randn(50, 3)
    rows[3] = [100.0, -100.0, 50.0]  # gross outlier
    m = compute_filtered_mean(rows)
    np.testing.assert_allclose(m, 1.0, atol=0.01)


def test_estimate_alignment_recovers_transform():
    key = jax.random.PRNGKey(0)
    T_gt = np.asarray(lie.se3_exp(jnp.array([0.5, -0.3, 0.2, 0.1, -0.05, 0.2])))
    loop_poses = np.asarray(lie.se3_exp(0.3 * jax.random.normal(key, (20, 6))))
    old_poses = np.array(lie.se3_mul(jnp.asarray(T_gt)[None], jnp.asarray(loop_poses)))
    # corrupt a few correspondences
    old_poses[2, :3] += 5.0
    old_poses[7, :3] -= 3.0

    T, rows = estimate_alignment(old_poses, loop_poses)
    np.testing.assert_allclose(T[:3], T_gt[:3], atol=0.02)
    assert abs(float(np.dot(T[3:7], T_gt[3:7]))) > 0.999

    # applying T^-1 to the transformed map returns it to the loop frame
    back = transform_poses(T, old_poses)
    good = np.ones(20, bool)
    good[[2, 7]] = False
    np.testing.assert_allclose(back[good], loop_poses[good], atol=0.05)


@pytest.mark.slow
def test_joint_backend_two_sessions():
    from droid_slam_reserch_tpu.engine import Droid
    from droid_slam_reserch_tpu.engine.droid import init_params
    from droid_slam_reserch_tpu.multisession import joint_backend
    from tests.test_engine import make_config, run_sequence

    cfg = make_config()
    params = init_params(cfg, seed=0)

    states = []
    for seed in (0, 1):
        droid = Droid(cfg, params=params)
        run_sequence(droid, 8)
        states.append(droid.video.state_dict())

    refined = joint_backend(cfg, params, states, steps=1)
    assert len(refined) == 2
    for r, s in zip(refined, states):
        assert r.shape == s["poses"].shape
        assert np.all(np.isfinite(r))


@pytest.mark.slow
def test_improve_adjust_gating_retry_and_stitch():
    """ImproveAdjust driver (reference ImproveAdjust.py:204-337): bad groups
    are rejected by the badT count, good forward+reverse groups are replayed
    ungated and stitched reverse-first."""
    from droid_slam_reserch_tpu.engine import Droid
    from droid_slam_reserch_tpu.engine.droid import init_params
    from droid_slam_reserch_tpu.multisession.pipeline import improve_adjust
    from tests.test_engine import INTR, make_config, run_sequence, synth_frame

    cfg = make_config(quality_mean_thresh=200.0, quality_min_thresh=10.0)
    params = init_params(cfg, seed=0)

    droid = Droid(cfg, params=params)
    run_sequence(droid, 8)
    first = droid.video.state_dict()
    n = len(first["poses"])
    seed_idx = list(range(min(5, n)))

    rng = np.random.RandomState(7)

    def frames(order):
        def gen():
            for t in order:
                yield float(100 + t), synth_frame(t, rng), INTR
        return gen

    # impossible gate thresholds force every frame bad -> group rejected
    bad_cfg = cfg.replace(quality_mean_thresh=1e9, quality_min_thresh=1e9)
    state, report = improve_adjust(
        bad_cfg, params, first,
        [dict(seed_idx=seed_idx, frame_idx=[0, 1, 2, 3, 4, 5],
              stream_factory=frames(range(12)), name="fwd")],
        bad_limit=4, probe_frames=12,
    )
    assert state is None
    assert report[0]["accepted"] is False and report[0]["bad"] > 4

    # permissive thresholds accept both groups; stitch = reverse then forward
    state, report = improve_adjust(
        cfg.replace(quality_mean_thresh=-1.0, quality_min_thresh=-1.0),
        params, first,
        [dict(seed_idx=seed_idx, frame_idx=[5, 4, 3, 2, 1, 0],
              stream_factory=frames(range(5, -1, -1)), name="rev"),
         dict(seed_idx=seed_idx, frame_idx=[0, 1, 2, 3, 4, 5],
              stream_factory=frames(range(6)), name="fwd")],
        bad_limit=4, probe_frames=12,
    )
    assert all(r["accepted"] for r in report)
    assert state is not None
    assert len(state["poses"]) > 0
    assert np.isfinite(state["poses"]).all()


def test_extract_images_by_timestamp_index_semantics(tmp_path):
    """Stage-1 keyframe export: the video stores stride*t frame indices as
    stamps (like the reference streams, loop_detect.py:79) and the extractor
    must index the name-sorted raw file list with them (reference
    loop_detect.py:96-105)."""
    from droid_slam_reserch_tpu.multisession.pipeline import (
        extract_images_by_timestamp,
    )

    src = tmp_path / "cam0" / "data"
    src.mkdir(parents=True)
    # EuRoC-style ns filenames, deliberately unsorted creation order
    stamps_ns = [1403636579763555584, 1403636579813555456, 1403636579863555584,
                 1403636579913555456, 1403636579963555584]
    for s in stamps_ns:
        (src / f"{s}.png").write_bytes(b"png" + str(s).encode())

    out = tmp_path / "keyframes"
    copied = extract_images_by_timestamp(str(src), [0.0, 2.0, 4.0], str(out))
    assert [int(c.split("/")[-1][:-4]) for c in copied] == [
        stamps_ns[0], stamps_ns[2], stamps_ns[4]
    ]
    assert sorted(f.name for f in out.iterdir()) == sorted(
        f"{stamps_ns[i]}.png" for i in (0, 2, 4)
    )

    # real-ns-stamp fallback still matches by nearest timestamp
    out2 = tmp_path / "keyframes2"
    copied2 = extract_images_by_timestamp(
        str(src), [float(stamps_ns[1]) + 3.0], str(out2), tol=0.5
    )
    assert len(copied2) == 1 and str(stamps_ns[1]) in copied2[0]
