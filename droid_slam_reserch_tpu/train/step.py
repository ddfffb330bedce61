"""Jittable training step (reference train.py:77-127 inner loop).

The full unrolled forward (iters x {corr lookup, GRU update, 2x dense BA})
is differentiated end-to-end; gradients flow through the Cholesky solves via
the custom VJP in ba/chol.py.
"""
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..geom.losses import flow_loss, geodesic_loss, residual_loss
from ..lie import se3_identity, se3_inv
from ..models import DroidNet


def onecycle_schedule(total_steps, peak_value, pct_start,
                      div_factor=25.0, final_div_factor=1e4):
    """Torch-exact OneCycleLR with anneal_strategy='cos' (the reference's
    scheduler: train.py:70, OneCycleLR(lr, steps, pct_start=0.01,
    cycle_momentum=False) — torch's default anneal is cosine).

    Differs from optax.cosine_onecycle_schedule only in the phase
    boundaries: torch ends the warmup at step pct_start*total_steps - 1 and
    the anneal at total_steps - 1 (0-indexed, inclusive), while optax uses
    pct_start*total_steps and total_steps.  Verified bit-close against
    torch.optim.lr_scheduler.OneCycleLR in tests/test_train_dynamic.py."""
    initial = peak_value / div_factor
    min_lr = initial / final_div_factor
    warm_end = pct_start * total_steps - 1.0
    anneal_end = total_steps - 1.0

    def _cos(a, b, pct):
        return b + (a - b) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        wp = jnp.clip(count / jnp.maximum(warm_end, 1e-6), 0.0, 1.0)
        ap = jnp.clip((count - warm_end)
                      / jnp.maximum(anneal_end - warm_end, 1e-6), 0.0, 1.0)
        return jnp.where(count <= warm_end,
                         _cos(initial, peak_value, wp),
                         _cos(peak_value, min_lr, ap))

    return schedule


def make_schedule(cfg):
    """OneCycle analog (reference train.py:69-70).

    total_steps is floored so the warmup phase spans >= 1 step (torch's
    OneCycleLR degenerates the same way when steps * pct_start < 1 — tiny
    smoke-test runs)."""
    import math

    steps = max(cfg.steps, int(math.ceil(1.0 / max(cfg.pct_start, 1e-6))) + 1)
    return onecycle_schedule(
        total_steps=steps, peak_value=cfg.lr, pct_start=cfg.pct_start
    )


def sanitize_grads():
    """Zero non-finite gradient entries before clipping.

    clip_by_global_norm couples every leaf through one norm, so a single
    inf/NaN gradient entry (one degenerate pixel in one edge of one batch)
    NaNs the entire parameter tree on the next update.  The reference's
    failure-tolerance stance is the same — its CUDA solver zeroes failed
    factorizations (droid_kernels.cu:1202-1210) rather than dying; a
    skipped contribution beats a dead 250k-step run."""
    def update_fn(updates, state, params=None):
        del params
        new = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),
            updates,
        )
        return new, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def make_optimizer(cfg):
    return optax.chain(
        sanitize_grads(),
        optax.clip_by_global_norm(cfg.clip),
        optax.adamw(make_schedule(cfg), weight_decay=cfg.weight_decay),
    )


def init_train_state(cfg, key=None, image_size=(64, 64)):
    """Random params + optimizer state (for tests / fresh runs)."""
    import numpy as np

    key = key if key is not None else jax.random.PRNGKey(0)
    net = DroidNet()
    h, w = image_size
    variables = net.init(
        key,
        se3_identity((1, 2)),
        jnp.zeros((1, 2, h, w, 3)),
        jnp.ones((1, 2, h // 8, w // 8)),
        jnp.broadcast_to(jnp.array([w / 2.0, w / 2.0, w / 2.0, h / 2.0]), (1, 2, 4)),
        np.array([0, 1]),
        np.array([1, 0]),
        1,
    )
    params = variables["params"]
    opt = make_optimizer(cfg)
    return params, opt.init(params)


def make_train_step(cfg, ii, jj, num_steps=None, dtype=None, remat=False,
                    debug=False, scan=False):
    """Build the jittable train step for a fixed edge graph (ii, jj).

    batch = dict(images [B,P,H,W,3] BGR 0-255, poses [B,P,7] world-to-camera,
    disps [B,P,H,W] GT inverse depth, intrinsics [B,P,4] full-res).
    Returns step(params, opt_state, batch) -> (params, opt_state, metrics).

    dtype: network compute dtype (bf16 on TPU; params, BA solves and losses
    stay fp32 — the same mixed-precision split the inference engine uses).
    remat: rematerialize the per-iteration update module during backprop,
    trading ~1 extra forward for O(iters) activation memory — the TPU-first
    lever for fitting the reference's 15-step unroll (train.py:155-159,
    24 GB GPUs) into v5e HBM.
    """
    net = DroidNet(dtype=dtype, remat=remat, scan=scan)
    opt = make_optimizer(cfg)
    num_steps = num_steps or cfg.iters

    def loss_fn(params, batch):
        images = batch["images"]
        Ps = se3_inv(batch["poses"])  # w2c -> c2w (reference train.py:83-84)
        disps_gt = batch["disps"]
        intrinsics = batch["intrinsics"]

        # pose init: frame 0 at GT, rest at frame 1's GT (reference :96-98)
        Gs = jnp.concatenate(
            [Ps[:, :1], jnp.repeat(Ps[:, 1:2], Ps.shape[1] - 1, axis=1)], axis=1
        )
        disp0 = jnp.ones_like(disps_gt[:, :, 3::8, 3::8])

        poses_est, disps_est, residuals = net.apply(
            {"params": params}, Gs, images, disp0, intrinsics / 8.0, ii, jj,
            num_steps, 2,
        )

        geo, geo_m = geodesic_loss(Ps, poses_est, ii, jj, do_scale=False)
        res, res_m = residual_loss(residuals)
        flo, flo_m = flow_loss(Ps, disps_gt, poses_est, disps_est, intrinsics)
        loss = cfg.w1 * geo + cfg.w2 * res + cfg.w3 * flo

        metrics = {"loss": loss, "geo": geo, "res": res, "flow": flo}
        metrics.update(geo_m)
        metrics.update(res_m)
        metrics.update(flo_m)
        if debug:
            def first_bad(xs):
                """Index of the first iteration with a non-finite value
                (len(xs) when all finite)."""
                flags = jnp.stack(
                    [jnp.any(~jnp.isfinite(x)) for x in xs]
                    + [jnp.array(True)]
                )
                return jnp.argmax(flags)

            metrics["nan_iter_pose"] = first_bad(poses_est)
            metrics["nan_iter_disp"] = first_bad(disps_est)
            metrics["nan_iter_res"] = first_bad(residuals)
        return loss, metrics

    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_train_step_dynamic(cfg, num_steps=None, dtype=None, remat=False,
                            scan=False):
    """Training step for per-item SAMPLED frame graphs and pose-restart
    chaining (reference train.py:88-118).

    The graph (ii/jj/edge validity mask, padded to a fixed length so the jit
    signature is stable) and the pose/disp initialization travel IN the
    batch:

        batch = {images, poses, disps, intrinsics,
                 ii [E], jj [E], emask [E] float,
                 Gs0 [B,P,7], disp0 [B,P,H/8,W/8]}

    Returns (grad_step, apply_step):
      grad_step(params, batch) -> (grads, metrics, (Gs_last, disp_last))
        one forward/backward pass; the carry re-seeds Gs0/disp0 for the
        reference's random-restart loop (train.py:102-118), which
        ACCUMULATES gradients across passes and steps the optimizer once.
      apply_step(params, opt_state, grads) -> (params, opt_state)

    dtype/remat/scan: see make_train_step.
    """
    net = DroidNet(dtype=dtype, remat=remat, scan=scan)
    opt = make_optimizer(cfg)
    num_steps = num_steps or cfg.iters

    def loss_fn(params, batch):
        images = batch["images"]
        Ps = se3_inv(batch["poses"])
        disps_gt = batch["disps"]
        intrinsics = batch["intrinsics"]
        ii, jj, emask = batch["ii"], batch["jj"], batch["emask"]

        poses_est, disps_est, residuals = net.apply(
            {"params": params}, batch["Gs0"], images, batch["disp0"],
            intrinsics / 8.0, ii, jj, num_steps, 2, edge_mask=emask,
        )

        geo, geo_m = geodesic_loss(Ps, poses_est, ii, jj, do_scale=False,
                                   edge_mask=emask)
        res, res_m = residual_loss(residuals, edge_mask=emask)
        flo, flo_m = flow_loss(Ps, disps_gt, poses_est, disps_est, intrinsics)
        loss = cfg.w1 * geo + cfg.w2 * res + cfg.w3 * flo

        metrics = {"loss": loss, "geo": geo, "res": res, "flow": flo}
        metrics.update(geo_m)
        metrics.update(res_m)
        metrics.update(flo_m)
        carry = (
            jax.lax.stop_gradient(poses_est[-1]),
            jax.lax.stop_gradient(disps_est[-1][:, :, 3::8, 3::8]),
        )
        return loss, (metrics, carry)

    @jax.jit
    def grad_step(params, batch):
        (_, (metrics, carry)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        return grads, metrics, carry

    @jax.jit
    def apply_step(params, opt_state, grads):
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    return grad_step, apply_step


def sample_frame_graph(rng, poses, disps, intrinsics, n_frames, e_pad,
                       num_edges=24, r=2):
    """Per-item graph sampling (reference train.py:88-94): 50% covisibility
    graph from the GT flow-distance matrix, 50% radius-2 temporal graph.
    Host-side; returns (ii, jj, emask) padded to e_pad.

    poses/disps/intrinsics: numpy batch arrays (item 0 is used, as the
    reference does — graph_utils.py:38-42); disps at full res.
    """
    import numpy as np

    from ..data.rgbd_utils import compute_distance_matrix_flow
    from ..geom.graph_utils import build_frame_graph, graph_to_edge_list

    if rng.random() < 0.5:
        d = compute_distance_matrix_flow(
            np.asarray(poses[0]),
            np.asarray(disps[0][:, 3::8, 3::8]),
            np.asarray(intrinsics[0]) / 8.0,
        )
        graph = build_frame_graph(d, num=num_edges, r=r)
        ii, jj, _ = graph_to_edge_list(graph)
    else:
        ii, jj = [], []
        for i in range(n_frames):
            for j in range(n_frames):
                if i != j and abs(i - j) <= r:
                    ii.append(i)
                    jj.append(j)
        ii, jj = np.asarray(ii, np.int32), np.asarray(jj, np.int32)
    n = min(len(ii), e_pad)
    ii_p = np.zeros(e_pad, np.int32)
    jj_p = np.zeros(e_pad, np.int32)
    em = np.zeros(e_pad, np.float32)
    ii_p[:n], jj_p[:n], em[:n] = ii[:n], jj[:n], 1.0
    # padded self-edge placeholders keep reprojection well-defined
    jj_p[n:] = 1
    return ii_p, jj_p, em
