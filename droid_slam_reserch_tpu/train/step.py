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


def make_schedule(cfg):
    """OneCycle analog (reference train.py:69-70)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=cfg.steps, peak_value=cfg.lr, pct_start=cfg.pct_start
    )


def make_optimizer(cfg):
    return optax.chain(
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


def make_train_step(cfg, ii, jj, num_steps=None):
    """Build the jittable train step for a fixed edge graph (ii, jj).

    batch = dict(images [B,P,H,W,3] BGR 0-255, poses [B,P,7] world-to-camera,
    disps [B,P,H,W] GT inverse depth, intrinsics [B,P,4] full-res).
    Returns step(params, opt_state, batch) -> (params, opt_state, metrics).
    """
    net = DroidNet()
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
        return loss, metrics

    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step
