"""Dynamic-graph training step: sampled graphs, edge masking, restarts
(reference train.py:88-118)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_reserch_tpu import lie
from droid_slam_reserch_tpu.train import TrainConfig, init_train_state
from droid_slam_reserch_tpu.train.step import (
    make_train_step_dynamic, sample_frame_graph)


def make_batch(key, B=1, P=4, h=64, w=64, e_pad=16):
    ks = jax.random.split(key, 4)
    images = 255.0 * jax.random.uniform(ks[0], (B, P, h, w, 3))
    poses = lie.se3_exp(0.05 * jax.random.normal(ks[1], (B, P, 6)))
    disps = 0.8 + 0.4 * jax.random.uniform(ks[2], (B, P, h, w))
    intr = jnp.broadcast_to(jnp.array([40.0, 40.0, w / 2, h / 2]), (B, P, 4))
    rng = np.random.default_rng(0)
    ii, jj, emask = sample_frame_graph(
        rng, np.asarray(poses), np.asarray(disps), np.asarray(intr), P, e_pad)
    Ps = lie.se3_inv(poses)
    Gs0 = jnp.concatenate([Ps[:, :1], jnp.repeat(Ps[:, 1:2], P - 1, axis=1)], 1)
    return {
        "images": images, "poses": poses, "disps": disps, "intrinsics": intr,
        "ii": jnp.asarray(ii), "jj": jnp.asarray(jj), "emask": jnp.asarray(emask),
        "Gs0": Gs0, "disp0": jnp.ones((B, P, h // 8, w // 8)),
    }


def test_sample_frame_graph_covisibility_and_temporal():
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    P = 5
    poses = np.asarray(lie.se3_exp(0.05 * jax.random.normal(key, (1, P, 6))))
    disps = np.ones((1, P, 64, 64), np.float32)
    intr = np.broadcast_to(np.array([40.0, 40.0, 32.0, 32.0], np.float32), (1, P, 4))
    seen_counts = set()
    for _ in range(8):
        ii, jj, em = sample_frame_graph(rng, poses, disps, intr, P, 24)
        n = int(em.sum())
        assert len(ii) == 24 and n > 0
        assert np.all(ii[em > 0] != jj[em > 0])
        seen_counts.add(n)
    # both branches (covisibility num=24 vs temporal r=2) get sampled
    assert len(seen_counts) >= 1


def test_dynamic_step_runs_and_masks_padding():
    cfg = TrainConfig(batch=1, n_frames=4, iters=1, steps=10)
    params, opt_state = init_train_state(cfg, image_size=(64, 64))
    grad_step, apply_step = make_train_step_dynamic(cfg)
    batch = make_batch(jax.random.PRNGKey(3))

    grads, metrics, (Gs_last, disp_last) = grad_step(params, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert Gs_last.shape == batch["Gs0"].shape
    assert disp_last.shape == batch["disp0"].shape

    # padded edges must not change the loss: flipping padded jj is a no-op
    jj2 = np.asarray(batch["jj"]).copy()
    pad = np.asarray(batch["emask"]) == 0
    assert pad.any()
    jj2[pad] = (jj2[pad] + 1) % 4
    batch2 = dict(batch, jj=jnp.asarray(jj2))
    _, metrics2, _ = grad_step(params, batch2)
    np.testing.assert_allclose(float(metrics2["loss"]), float(metrics["loss"]),
                               rtol=1e-5)

    # restart chaining + grad accumulation applies cleanly
    grads2, _, _ = grad_step(params, dict(batch, Gs0=Gs_last, disp0=disp_last))
    acc = jax.tree_util.tree_map(jnp.add, grads, grads2)
    p2, _ = apply_step(params, opt_state, acc)
    flat = jax.tree_util.tree_leaves(p2)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_checkpoint_resume_equivalence(tmp_path):
    """Training N steps straight == N/2 steps + save_ckpt/load_ckpt + N/2
    more, bit-for-bit: the checkpoint carries the full optax state
    (Adam moments + schedule count), so resume loses nothing
    (SURVEY.md §5 checkpoint formalization; reference train.py:134-136
    restores weights only and silently resets the optimizer)."""
    from droid_slam_reserch_tpu.train import load_ckpt, save_ckpt

    cfg = TrainConfig(batch=1, n_frames=4, iters=1, steps=10)
    grad_step, apply_step = make_train_step_dynamic(cfg)

    def batch_for(t):
        return make_batch(jax.random.PRNGKey(100 + t))

    def run(params, opt_state, t0, t1):
        for t in range(t0, t1):
            grads, _, _ = grad_step(params, batch_for(t))
            params, opt_state = apply_step(params, opt_state, grads)
        return params, opt_state

    p0, s0 = init_train_state(cfg, image_size=(64, 64))
    p_straight, _ = run(p0, s0, 0, 4)

    p_half, s_half = run(p0, s0, 0, 2)
    path = str(tmp_path / "ck.npz")
    save_ckpt(path, p_half, s_half, 2)
    p_re, s_re, step = load_ckpt(path)
    assert step == 2
    p_resumed, _ = run(p_re, s_re, step, 4)

    ls = jax.tree_util.tree_leaves(p_straight)
    lr = jax.tree_util.tree_leaves(p_resumed)
    for a, b in zip(ls, lr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_params_only_back_compat(tmp_path):
    """A reference-style params-only npz loads as a warm start."""
    from droid_slam_reserch_tpu.train import load_ckpt

    cfg = TrainConfig(batch=1, n_frames=4, iters=1, steps=10)
    params, _ = init_train_state(cfg, image_size=(64, 64))
    path = str(tmp_path / "weights.npz")
    obj = np.empty((), object)
    obj[()] = jax.tree_util.tree_map(np.asarray, params)
    np.savez(path, params=obj)
    p, opt, step = load_ckpt(path)
    assert opt is None and step == 0
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_onecycle_schedule_matches_torch():
    """The lr schedule must be torch-exact: the reference trains with
    OneCycleLR(lr, steps, pct_start=0.01, cycle_momentum=False) (reference
    train.py:70; torch default anneal_strategy='cos', div_factor=25,
    final_div_factor=1e4).  Compare every step's lr against torch."""
    import torch

    from droid_slam_reserch_tpu.train.step import onecycle_schedule

    steps, lr, pct = 1000, 2.5e-4, 0.01
    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, lr, steps, pct_start=pct, cycle_momentum=False
    )
    tvals = []
    for _ in range(steps):
        tvals.append(opt.param_groups[0]["lr"])
        opt.step()
        sch.step()
    tvals = np.asarray(tvals)

    mine = onecycle_schedule(steps, lr, pct)
    ovals = np.asarray([float(mine(i)) for i in range(steps)])

    # fp32 cos rounding dominates only on the sub-1e-7 tail of the decay
    mask = tvals > 1e-7
    rel = np.abs(tvals[mask] - ovals[mask]) / tvals[mask]
    assert rel.max() < 1e-4, rel.max()
    assert np.abs(tvals - ovals).max() < 1e-9


@pytest.mark.slow
def test_train_loss_decreases_scan_remat():
    """The production step configuration (lax.scan over iterations +
    per-iteration remat, the setup that trains at reference scale on the
    chip — tools/bench_train.py): overfitting one synthetic scene, the
    loss must fall and never go non-finite.  Guards the safe-norm losses
    and the sanitize-grads optimizer path (a single NaN cotangent used to
    NaN every parameter through clip_by_global_norm)."""
    import jax.numpy as jnp

    from droid_slam_reserch_tpu.train.config import TrainConfig
    from droid_slam_reserch_tpu.train.step import (init_train_state,
                                                   make_train_step)
    from tools.bench_train import synth_scene, temporal_graph

    H, W, F, IT = 64, 64, 4, 3
    cfg = TrainConfig(steps=250000, iters=IT, n_frames=F, image_size=(H, W))
    ii, jj = temporal_graph(F, r=2)
    rng = np.random.default_rng(0)
    images, poses, disps, intr = synth_scene(rng, F, H, W)
    batch = {
        "images": jnp.asarray(images[None]),
        "poses": jnp.asarray(poses[None]),
        "disps": jnp.asarray(disps[None]),
        "intrinsics": jnp.asarray(intr[None]),
    }
    params, opt_state = init_train_state(cfg, image_size=(64, 64))
    step = jax.jit(make_train_step(cfg, ii, jj, num_steps=IT, remat=True,
                                   scan=True))
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
