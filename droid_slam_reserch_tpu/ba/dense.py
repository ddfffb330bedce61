"""Differentiable dense bundle adjustment for training (reference geom/ba.py).

One Gauss-Newton step with depth variables eliminated via a dense Schur
complement — gradients flow through the Cholesky solve (custom VJP in
chol.py).  Depth buckets are *all* P frames (static shapes); frames without
edges get zero updates, which is algebraically identical to the reference's
unique(ii) bucketing (geom/ba.py:70-102) but jit-stable.
"""
import jax.numpy as jnp

from ..lie import se3_retr, sim3_retr
from .chol import block_solve, schur_solve
from .system import build_system_blocks


def _scatter_mat(A, ii, jj, n, m):
    """Scatter-add [B,N,...] blocks into dense [B,n,m,...] (reference ba.py:12-14)."""
    v = (ii >= 0) & (jj >= 0) & (ii < n) & (jj < m)
    idx = jnp.where(v, ii * m + jj, n * m)  # dump invalid into overflow bucket
    vmask = v.reshape((1, -1) + (1,) * (A.ndim - 2))
    out = jnp.zeros((A.shape[0], n * m + 1) + A.shape[2:], A.dtype)
    out = out.at[:, idx].add(jnp.where(vmask, A, 0.0))
    return out[:, : n * m].reshape(A.shape[0], n, m, *A.shape[2:])


def _scatter_vec(b, ii, n):
    v = (ii >= 0) & (ii < n)
    idx = jnp.where(v, ii, n)
    out = jnp.zeros((b.shape[0], n + 1) + b.shape[2:], b.dtype)
    vmask = v.reshape((1, -1) + (1,) * (b.ndim - 2))
    out = out.at[:, idx].add(jnp.where(vmask, b, 0.0))
    return out[:, :n]


def BA(
    target,
    weight,
    eta,
    poses,
    disps,
    intrinsics,
    ii,
    jj,
    fixedp=1,
    group="se3",
    min_depth=0.2,
    ep=0.1,
    lm=1e-4,
):
    """Full differentiable DBA step (reference geom/ba.py:31-107).

    target/weight: [B,N,H,W,2]; eta: [B,P,H,W] per-frame damping (full
    buffer — scatter GraphAgg outputs before calling); poses [B,P,7|8];
    disps [B,P,H,W].  Returns updated (poses, disps).
    """
    B, P, H, W = disps.shape
    HW = H * W
    D = 6 if group == "se3" else 7

    blk = build_system_blocks(
        target, weight, poses, disps, intrinsics, ii, jj, group=group, min_depth=min_depth
    )

    # only optimize keyframe poses: shift indices (reference ba.py:73-76)
    Pf = P - fixedp
    iif = ii - fixedp
    jjf = jj - fixedp

    H_mat = (
        _scatter_mat(blk["Hii"], iif, iif, Pf, Pf)
        + _scatter_mat(blk["Hij"], iif, jjf, Pf, Pf)
        + _scatter_mat(blk["Hji"], jjf, iif, Pf, Pf)
        + _scatter_mat(blk["Hjj"], jjf, jjf, Pf, Pf)
    )
    v = _scatter_vec(blk["vi"], iif, Pf) + _scatter_vec(blk["vj"], jjf, Pf)

    # pose-depth coupling: depth bucket of an edge is its source frame ii
    E = _scatter_mat(blk["Ei"], iif, ii, Pf, P) + _scatter_mat(blk["Ej"], jjf, ii, Pf, P)
    E = E.reshape(B, Pf, P, D, HW)

    C = _scatter_vec(blk["Ck"], ii, P)
    w = _scatter_vec(blk["wk"], ii, P)
    C = C + eta.reshape(B, P, HW) + 1e-7

    dx, dz = schur_solve(H_mat, E, C, v, w, ep=ep, lm=lm)

    # retractions (reference ba.py:100-105)
    retr = se3_retr if group == "se3" else sim3_retr
    dx_full = jnp.zeros((B, P, D), poses.dtype).at[:, fixedp:].set(dx)
    poses = retr(poses, dx_full)
    disps = disps + dz.reshape(B, P, H, W)
    disps = jnp.where(disps > 10.0, jnp.zeros_like(disps), disps)
    disps = jnp.maximum(disps, 0.0)
    return poses, disps


def MoBA(
    target,
    weight,
    eta,
    poses,
    disps,
    intrinsics,
    ii,
    jj,
    fixedp=1,
    group="se3",
    min_depth=0.2,
    ep=0.1,
    lm=1e-4,
):
    """Motion-only BA step (reference geom/ba.py:110-158)."""
    B, P = poses.shape[:2]
    D = 6 if group == "se3" else 7

    blk = build_system_blocks(
        target, weight, poses, disps, intrinsics, ii, jj, group=group, min_depth=min_depth
    )

    Pf = P - fixedp
    iif = ii - fixedp
    jjf = jj - fixedp

    H_mat = (
        _scatter_mat(blk["Hii"], iif, iif, Pf, Pf)
        + _scatter_mat(blk["Hij"], iif, jjf, Pf, Pf)
        + _scatter_mat(blk["Hji"], jjf, iif, Pf, Pf)
        + _scatter_mat(blk["Hjj"], jjf, jjf, Pf, Pf)
    )
    v = _scatter_vec(blk["vi"], iif, Pf) + _scatter_vec(blk["vj"], jjf, Pf)

    dx = block_solve(H_mat, v, ep=ep, lm=lm)

    retr = se3_retr if group == "se3" else sim3_retr
    dx_full = jnp.zeros((B, P, D), poses.dtype).at[:, fixedp:].set(dx)
    return retr(poses, dx_full)
