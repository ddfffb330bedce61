"""Training losses (reference droid_slam/geom/losses.py) — pure JAX.

- geodesic_loss: gamma-weighted relative-pose loss over graph edges (:30-74)
- residual_loss: gamma-weighted mean |BA residual| (:77-86)
- flow_loss: gamma-weighted EPE on +-1 temporal edges (:89-118)
"""
import jax.numpy as jnp
import numpy as np


def _safe_norm(x, axis=-1):
    """L2 norm with a finite gradient at exactly zero.

    jnp.linalg.norm's gradient at 0 is 0/0 = NaN; one such pixel in a
    masked-out region poisons the whole parameter tree through
    clip_by_global_norm (observed training at reference scale on the chip:
    a single NaN cotangent NaN'd every leaf at the next optimizer step).
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-12)

from ..lie import (
    se3_mul,
    se3_inv,
    se3_log,
    so3_log,
    sim3_mul,
    sim3_inv,
    sim3_log,
)
from .projective import projective_transform


def _rel(poses, ii, jj, group):
    if group == "se3":
        return se3_mul(poses[:, jj], se3_inv(poses[:, ii]))
    return sim3_mul(poses[:, jj], sim3_inv(poses[:, ii]))


def fit_scale(Ps, Gs):
    """Least-squares scale aligning translations of Gs to Ps (reference :21-27)."""
    b = Ps.shape[0]
    t1 = Ps[..., :3].reshape(b, -1)
    t2 = Gs[..., :3].reshape(b, -1)
    return jnp.sum(t1 * t2, -1) / (jnp.sum(t2 * t2, -1) + 1e-8)


def pose_metrics(dG, dP):
    """Rotation (deg) / translation errors of dG vs dP (reference :9-19)."""
    if dG.shape[-1] == 7:
        dE = se3_mul(dG, se3_inv(dP))
        q = dE[..., 3:7]
        s_err = jnp.zeros(dE.shape[:-1])
    else:
        dE = sim3_mul(dG, sim3_inv(dP))
        q = dE[..., 3:7]
        s_err = jnp.abs(dE[..., 7] - 1.0)
    ang = jnp.linalg.norm(so3_log(q), axis=-1)
    r_err = (180.0 / np.pi) * ang
    t_err = jnp.linalg.norm(dE[..., :3], axis=-1)
    return r_err, t_err, s_err


def _masked_mean(x, mask):
    """Mean of x [B, E] counting only mask-valid [E] edges."""
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m[None, :]) / jnp.maximum(x.shape[0] * jnp.sum(m), 1.0)


def geodesic_loss(Ps, Gs_list, ii, jj, gamma=0.9, do_scale=True, group="se3",
                  edge_mask=None):
    """gamma-weighted relative pose loss (reference :30-74).

    Ps: GT poses [B,P,7|8]; Gs_list: per-iteration estimates.
    edge_mask: optional [E] validity for padded sampled graphs — masked
    edges contribute neither loss nor metrics.
    """
    dP = _rel(Ps, ii, jj, group)
    n = len(Gs_list)
    loss = 0.0
    r_err = t_err = None
    for i, Gs in enumerate(Gs_list):
        w = gamma ** (n - i - 1)
        dG = _rel(Gs, ii, jj, group)
        if do_scale:
            s = fit_scale(dP, dG)
            dG = dG.at[..., :3].multiply(s[:, None, None])
        if group == "se3":
            d = se3_log(se3_mul(dG, se3_inv(dP)))
            tau, phi = d[..., :3], d[..., 3:6]
            loss = loss + w * (
                _masked_mean(_safe_norm(tau), edge_mask)
                + _masked_mean(_safe_norm(phi), edge_mask)
            )
        else:
            d = sim3_log(sim3_mul(dG, sim3_inv(dP)))
            tau, phi, sig = d[..., :3], d[..., 3:6], d[..., 6:7]
            loss = loss + w * (
                _masked_mean(_safe_norm(tau), edge_mask)
                + _masked_mean(_safe_norm(phi), edge_mask)
                + 0.05 * _masked_mean(_safe_norm(sig), edge_mask)
            )
        r_err, t_err, s_err = pose_metrics(dG, dP)

    metrics = {
        "rot_error": _masked_mean(r_err, edge_mask),
        "tr_error": _masked_mean(t_err, edge_mask),
        "bad_rot": _masked_mean((r_err < 0.1).astype(jnp.float32), edge_mask),
        "bad_tr": _masked_mean((t_err < 0.01).astype(jnp.float32), edge_mask),
    }
    return loss, metrics


def residual_loss(residuals, gamma=0.9, edge_mask=None):
    """gamma-weighted mean |residual| (reference :77-86).

    edge_mask: optional [E] validity for padded sampled graphs; residuals
    are [B, E, h, w, 2]."""
    n = len(residuals)
    loss = 0.0
    for i, r in enumerate(residuals):
        w = gamma ** (n - i - 1)
        r_edge = jnp.mean(jnp.abs(r), axis=tuple(range(2, r.ndim)))
        loss = loss + w * _masked_mean(r_edge, edge_mask)
    return loss, {"residual": loss}


def flow_loss(Ps, disps, poses_est, disps_est, intrinsics, gamma=0.9):
    """gamma-weighted EPE between GT-induced and estimated flow (reference :89-118)."""
    N = Ps.shape[1]
    ii, jj = [], []
    for i in range(N):
        for j in range(N):
            if abs(i - j) == 1:
                ii.append(i)
                jj.append(j)
    ii = np.asarray(ii, dtype=np.int32)
    jj = np.asarray(jj, dtype=np.int32)

    coords0, val0 = projective_transform(Ps, disps, intrinsics, ii, jj)
    val0 = val0 * (disps[:, ii] > 0).astype(val0.dtype)[..., None]

    n = len(poses_est)
    loss = 0.0
    epe = v = None
    for i in range(n):
        w = gamma ** (n - i - 1)
        coords1, val1 = projective_transform(poses_est[i], disps_est[i], intrinsics, ii, jj)
        v = (val0 * val1)[..., 0]
        epe = v * _safe_norm(coords1 - coords0)
        loss = loss + w * jnp.mean(epe)

    mask = v.reshape(-1) > 0.5
    epe_flat = epe.reshape(-1)
    denom = jnp.maximum(jnp.sum(mask), 1)
    metrics = {
        "f_error": jnp.sum(jnp.where(mask, epe_flat, 0.0)) / denom,
        "1px": jnp.sum(jnp.where(mask, (epe_flat < 1.0).astype(jnp.float32), 0.0)) / denom,
    }
    return loss, metrics
