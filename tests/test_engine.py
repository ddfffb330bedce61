"""End-to-end engine tests on synthetic sequences (random weights).

The reference has no runtime tests at all (SURVEY.md §4); these exercise
keyframe admission, graph construction, frontend init/update, keyframe
culling, global backend, and trajectory filling on a tiny CPU problem.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_reserch_tpu.engine import Droid
from droid_slam_reserch_tpu.engine.droid import SDroid, init_params
from droid_slam_reserch_tpu.utils import DroidConfig

H, W = 64, 96
INTR = np.array([60.0, 60.0, W / 2.0, H / 2.0], np.float32)


def make_config(**kw):
    base = dict(
        image_size=(H, W), buffer=32, warmup=5, filter_thresh=-1.0,
        frontend_window=8, frontend_thresh=32.0, max_factors=32,
        keyframe_thresh=0.0,  # keep every keyframe (synthetic motion is large)
        init_iters=2, iters1=1, iters2=1,
        backend_steps_first=1, backend_steps_second=1,
        edge_bucket=8, window_bucket=4,
    )
    base.update(kw)
    return DroidConfig(**base)


def synth_frame(t, rng):
    """Textured pattern translating over time."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = (
        127 + 80 * np.sin(0.2 * (xs + 6 * t)) * np.cos(0.15 * (ys + 3 * t))
        + 20 * rng.standard_normal((H, W))
    )
    return np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)


@pytest.fixture(scope="module")
def shared_params():
    return init_params(make_config(), seed=0)


def run_sequence(droid, n_frames=12):
    rng = np.random.RandomState(0)
    for t in range(n_frames):
        droid.track(float(t), synth_frame(t, rng), intrinsics=INTR)
    return droid


class TestDroidPipeline:
    def test_tracking_and_termination(self, shared_params):
        cfg = make_config()
        droid = Droid(cfg, params=shared_params)
        run_sequence(droid, 10)

        assert droid.video.counter >= cfg.warmup
        assert droid.frontend.is_initialized
        t = droid.video.counter
        poses = np.asarray(droid.video.poses[:t])
        disps = np.asarray(droid.video.disps[:t])
        assert np.all(np.isfinite(poses))
        assert np.all(np.isfinite(disps))
        assert np.all(disps >= 0.001)

        droid.terminate()
        poses = np.asarray(droid.video.poses[:t])
        assert np.all(np.isfinite(poses))

    def test_trajectory_filler(self, shared_params):
        cfg = make_config()
        droid = Droid(cfg, params=shared_params)
        run_sequence(droid, 10)

        rng = np.random.RandomState(0)
        stream = [(float(t), synth_frame(t, rng), INTR) for t in range(10)]
        traj = droid.terminate_eva(iter(stream))
        assert traj.shape == (10, 7)
        assert np.all(np.isfinite(traj))

    def test_save_reconstruction(self, shared_params, tmp_path):
        cfg = make_config()
        droid = Droid(cfg, params=shared_params)
        run_sequence(droid, 8)
        droid.save_reconstruction(str(tmp_path))
        data = np.load(tmp_path / "reconstruction.npz")
        t = droid.video.counter
        assert data["poses"].shape == (t, 7)
        assert data["fmaps"].shape[0] == t

    def test_session_reload(self, shared_params, tmp_path):
        """Save a session, inject into a fresh SDroid (Give_Data analog)."""
        cfg = make_config()
        droid = Droid(cfg, params=shared_params)
        run_sequence(droid, 8)
        state = droid.video.state_dict()
        t = droid.video.counter

        droid2 = SDroid(cfg, params=shared_params)
        droid2.video.load_state_dict(state)
        assert droid2.video.counter == t
        np.testing.assert_allclose(
            np.asarray(droid2.video.poses[:t]), state["poses"], atol=1e-5
        )

    def test_keyframe_culling(self, shared_params):
        """With a huge keyframe_thresh every post-init keyframe gets culled."""
        cfg = make_config(keyframe_thresh=1e6)
        droid = Droid(cfg, params=shared_params)
        run_sequence(droid, 10)
        # counter stays near warmup+1 as later keyframes are culled
        assert droid.video.counter <= cfg.warmup + 2


class TestStereoPipeline:
    def test_stereo_tracking(self, shared_params):
        cfg = make_config(stereo=True)
        droid = Droid(cfg, params=shared_params)
        rng = np.random.RandomState(1)
        for t in range(8):
            left = synth_frame(t, rng)
            right = np.roll(left, -2, axis=1)
            droid.track(float(t), np.stack([left, right]), intrinsics=INTR)
        assert droid.frontend.is_initialized
        t = droid.video.counter
        assert np.all(np.isfinite(np.asarray(droid.video.poses[:t])))
        # stereo self-edges must exist in the graph
        g = droid.frontend.graph
        assert np.any(g.ii == g.jj) or np.any(g.ii_inac == g.jj_inac)


class TestRGBD:
    def test_rgbd_tracking(self, shared_params):
        cfg = make_config(rgbd=True)
        droid = Droid(cfg, params=shared_params)
        rng = np.random.RandomState(2)
        for t in range(8):
            depth = 2.0 + 0.5 * rng.rand(H, W).astype(np.float32)
            droid.track(float(t), synth_frame(t, rng), depth=depth, intrinsics=INTR)
        assert droid.frontend.is_initialized
        t = droid.video.counter
        assert np.any(np.asarray(droid.video.disps_sens[:t]) > 0)


def test_distance_matrix_bidirectional(shared_params):
    """Proximity-graph distances must average both flow directions like the
    reference's default video.distance (depth_video.py:160-182) — an edge-set
    parity requirement for add_proximity_factors (factor_graph.py:326)."""
    from droid_slam_reserch_tpu.geom import frame_distance

    droid = run_sequence(Droid(make_config(), params=shared_params), n_frames=10)
    v = droid.video
    t = v.counter
    assert t >= 4
    d = v.distance_matrix(0, 0, t)

    ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    intr = v.intrinsics[0]
    d1 = np.asarray(frame_distance(v.poses, v.disps, intr, ii, jj, beta=0.3))
    d2 = np.asarray(frame_distance(v.poses, v.disps, intr, jj, ii, beta=0.3))
    oracle = (0.5 * (d1 + d2)).reshape(t, t)
    np.testing.assert_allclose(d, oracle, rtol=1e-5, atol=1e-5)


def test_upsample_through_fused_frontend(shared_params):
    """--upsample must ride the fused one-dispatch path: update_fused's final
    round emits the upmask and populates disps_up (reference upsamples during
    updates, factor_graph.py:246-248)."""
    droid = run_sequence(
        Droid(make_config(upsample=True), params=shared_params), n_frames=10
    )
    v = droid.video
    assert v.disps_up is not None
    up = np.asarray(v.disps_up[: v.counter])
    assert up.shape[1:] == (H, W)
    assert np.isfinite(up).all()
    assert (np.abs(up) > 0).any()


def test_backend_upsample_through_lowmem(shared_params):
    """--upsample through terminate(): the scanned lowmem refresh must
    populate disps_up for backend-refined frames (reference upsamples in
    update_lowmem chunks, factor_graph.py:294)."""
    droid = run_sequence(
        Droid(make_config(upsample=True), params=shared_params), n_frames=10
    )
    droid.terminate()
    v = droid.video
    assert v.disps_up is not None
    up = np.asarray(v.disps_up[: v.counter])
    assert np.isfinite(up).all()
    assert (np.abs(up) > 0).any()


def test_fused_rounds_match_sequential_updates(shared_params):
    """update_fused(rounds=K) must track the same trajectory as K separate
    update() calls (reference droid_frontend.py:52-53 loops) — the fused
    one-dispatch redesign is an execution change, not a semantic one."""
    import types

    da = run_sequence(Droid(make_config(), params=shared_params), n_frames=10)

    db = Droid(make_config(), params=shared_params)

    def seq_updates(self, rounds, t0=None, cull_pair=None):
        for _ in range(rounds):
            self.graph.update(t0, None, use_inactive=True)
        if cull_pair is not None:
            # the pre-fusion culling path: a separate distance dispatch
            return self.video.distance(
                [cull_pair[0]], [cull_pair[1]], beta=self.beta,
                bidirectional=True,
            )[0]

    db.frontend._run_updates = types.MethodType(seq_updates, db.frontend)
    run_sequence(db, n_frames=10)

    ta, tb = da.video.counter, db.video.counter
    assert ta == tb
    pa = np.asarray(da.video.poses[:ta])
    pb = np.asarray(db.video.poses[:tb])
    dda = np.asarray(da.video.disps[:ta])
    ddb = np.asarray(db.video.disps[:tb])
    np.testing.assert_allclose(pa, pb, atol=2e-3)
    np.testing.assert_allclose(dda, ddb, atol=2e-2)


def test_fused_cull_distance_matches_video_distance(shared_params):
    """The in-graph culling distance update_fused returns must equal the
    separate video.distance dispatch on the post-update state."""
    droid = run_sequence(Droid(make_config(), params=shared_params), n_frames=10)
    g = droid.frontend.graph
    v = droid.video
    t1 = droid.frontend.t1
    d_fused = g.update_fused(
        1, use_inactive=True, cull_pair=(t1 - 3, t1 - 2)
    )
    d_ref = v.distance([t1 - 3], [t1 - 2], beta=droid.frontend.beta,
                       bidirectional=True)[0]
    np.testing.assert_allclose(float(d_fused), float(d_ref), rtol=1e-4,
                               atol=1e-4)


def test_fused_motion_only_matches_sequential(shared_params):
    """The trajectory filler's fused 6-round motion-only program must match
    6 sequential update(motion_only=True) calls (reference
    trajectory_filler.py:67-72)."""
    import copy

    da = run_sequence(Droid(make_config(), params=shared_params), n_frames=10)
    from droid_slam_reserch_tpu.engine.factor_graph import FactorGraph

    v = da.video
    N = v.counter

    # brackets -> two temp frames appended after the keyframes
    for m in range(2):
        v.set_slot(N + m, 100.0 + m, None, v.poses[N - 1], 1.0, None,
                   v.intrinsics[0], v.fmaps[N - 1], v.nets[N - 1],
                   v.inps[N - 1])
    v.counter = N + 2
    t0b = np.array([N - 2, N - 2])
    t1b = np.array([N - 1, N - 1])
    # host-side snapshot — the engine's donated jit setters delete the old
    # device buffers in place, so device references would not survive run()
    state = {k: np.asarray(getattr(v, k)) for k in
             ("poses", "disps", "disps_sens", "damping", "nets")}

    def run(fused):
        for k, val in state.items():
            setattr(v, k, jnp.asarray(val, getattr(v, k).dtype))
        g = FactorGraph(v, da.frontend.graph.update_apply, da.frontend.graph.params)
        g.add_factors(t0b, np.arange(N, N + 2))
        g.add_factors(t1b, np.arange(N, N + 2))
        if fused:
            g.update_fused(6, t0=N, t1=N + 2, use_inactive=False,
                           motion_only=True)
        else:
            for _ in range(6):
                g.update(N, N + 2, motion_only=True)
        return np.asarray(v.poses[N : N + 2])

    p_seq = run(fused=False)
    p_fused = run(fused=True)
    v.counter = N
    np.testing.assert_allclose(p_fused, p_seq, atol=2e-4)


def test_lowmem_refresh_sharded_matches_single(shared_params):
    """The backend's chunked GRU+altcorr refresh sharded over the 8-device
    mesh (refresh_shards=-1 auto) must produce the same map as the
    single-device scanned refresh (refresh_shards=1)."""
    def run(shards):
        droid = Droid(make_config(refresh_shards=shards),
                      params=shared_params)
        run_sequence(droid, n_frames=10)
        droid.terminate()
        t = droid.video.counter
        return (np.asarray(droid.video.poses[:t]),
                np.asarray(droid.video.disps[:t]))

    p1, d1 = run(1)
    p8, d8 = run(-1)
    np.testing.assert_allclose(p8, p1, atol=2e-4)
    np.testing.assert_allclose(d8, d1, atol=2e-3)


def test_steady_state_syncs_per_frame(shared_params):
    """The sync-collapse contract: steady-state tracking performs exactly
    ONE blocking host sync per input frame (admission) plus one per
    keyframe (the culling distance riding the fused program) — the
    proximity matrix must come from the async prefetch, not a blocking
    dispatch (PROFILE.md r4 sync collapse)."""
    from droid_slam_reserch_tpu.utils.timing import SYNC_COUNT

    droid = Droid(make_config(), params=shared_params)
    rng = np.random.RandomState(0)
    for t in range(8):  # init + settle
        droid.track(float(t), synth_frame(t, rng), intrinsics=INTR)

    SYNC_COUNT[0] = 0
    n_more = 4
    for t in range(8, 8 + n_more):
        droid.track(float(t), synth_frame(t, rng), intrinsics=INTR)
    # filter_thresh=-1 keyframes every frame: admission + cull = 2/frame
    assert SYNC_COUNT[0] == 2 * n_more, SYNC_COUNT[0]
