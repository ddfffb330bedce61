"""Scalable inference BA driver — the TPU-native ba_cuda analog.

Design deltas vs reference src/droid_kernels.cu:1314-1434 (SURVEY.md §7):

- **No CPU round-trip**: the reference assembles the pose system on CPU in
  fp64 Eigen every Gauss-Newton iteration (droid_kernels.cu:1131-1213);
  here the pose Hessian is assembled with on-device segment-sums and solved
  by an on-device fp32 Cholesky with one iterative-refinement step.
- **Static-shape Schur complement**: the reference enumerates E-row pairs
  sharing a depth keyframe in a CPU loop (droid_kernels.cu:1244-1272);
  here edges are grouped per depth bucket on the host *once per graph
  revision* (``schur_pairs``), padded to a fixed max degree, and the
  S = E Q E^T blocks become one batched matmul [M, R*6, HW] x [M, HW, R*6]
  that rides the MXU.
- **Depth buckets = all frames < t1** (validity by masking) so every shape
  is static under jit.

Semantics preserved: per-edge blocks from ``build_system_blocks`` (the
projective_transform_kernel analog), RGB-D prior mixing with alpha = 0.05
(droid_kernels.cu:1395-1400), damping diag*(1+lm) + ep, retraction via
se3_retr, motion_only branch (droid_kernels.cu:1385-1392).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import se3_retr
from .system import build_system_blocks


def schur_pairs(ii, num_buckets, max_deg=None):
    """Host-side: group edge indices by their depth bucket (source frame).

    Returns (bucket_edges [M, R], bucket_mask [M, R]) where row k lists the
    edges e with ii[e] == k, padded with 0s and masked.
    """
    ii = np.asarray(ii)
    buckets = [[] for _ in range(num_buckets)]
    for e, k in enumerate(ii):
        if 0 <= k < num_buckets:
            buckets[int(k)].append(e)
    deg = max((len(b) for b in buckets), default=0)
    R = int(max_deg) if max_deg is not None else max(deg, 1)
    edges = np.zeros((num_buckets, R), dtype=np.int32)
    mask = np.zeros((num_buckets, R), dtype=bool)
    for k, b in enumerate(buckets):
        n = min(len(b), R)
        edges[k, :n] = b[:n]
        mask[k, :n] = True
    return edges, mask


def _scatter_blocks(vals, pi, pj, valid, P):
    """Scatter-add [..., 6, 6] blocks into dense [P, P, 6, 6]."""
    idx = jnp.where(valid, pi * P + pj, P * P)
    flat_vals = jnp.where(valid[..., None, None], vals, 0.0)
    out = jnp.zeros((P * P + 1, 6, 6), vals.dtype)
    out = out.at[idx.reshape(-1)].add(flat_vals.reshape(-1, 6, 6))
    return out[: P * P].reshape(P, P, 6, 6)


def _pose_matrix(Hblocks, P):
    """[P, P, 6, 6] -> [6P, 6P]."""
    return Hblocks.transpose(0, 2, 1, 3).reshape(6 * P, 6 * P)


def _damped_solve(S, v, lm, ep):
    """Damped Cholesky solve with one iterative-refinement step.

    fp32 on-device replacement for the reference's fp64 CPU SimplicialLLT
    (droid_kernels.cu:1192-1213); refinement recovers most of the lost
    precision.  Returns zeros on factorization failure (reference behavior).
    """
    n = S.shape[0]
    Sd = S + (ep + lm * jnp.diag(S)) * jnp.eye(n, dtype=S.dtype)
    L = jnp.linalg.cholesky(Sd)
    dx = jax.scipy.linalg.cho_solve((L, True), v)
    r = v - Sd @ dx
    dx = dx + jax.scipy.linalg.cho_solve((L, True), r)
    bad = jnp.any(jnp.isnan(dx))
    return jnp.where(bad, jnp.zeros_like(dx), dx)


@partial(
    jax.jit,
    static_argnames=("t0", "t1", "iterations", "motion_only", "alpha", "min_depth"),
)
def ba_solve(
    poses,
    disps,
    intrinsics,
    disps_sens,
    target,
    weight,
    eta,
    ii,
    jj,
    bucket_edges,
    bucket_mask,
    t0,
    t1,
    iterations=2,
    lm=1e-4,
    ep=0.1,
    motion_only=False,
    alpha=0.05,
    min_depth=0.25,
):
    """Dense bundle adjustment over the window [t0, t1).

    poses: [PT, 7] full buffer; disps/disps_sens: [PT, H, W]; intrinsics [4]
    (at 1/8 resolution); target/weight: [N, H, W, 2]; eta: [t1, H, W]
    per-frame damping; ii/jj: [N] edges; bucket_edges/bucket_mask from
    ``schur_pairs(ii, t1)``.  Returns updated (poses, disps).
    """
    P = t1 - t0
    M = t1
    H, W = disps.shape[-2:]
    HW = H * W
    N = ii.shape[0]

    intr_full = jnp.broadcast_to(intrinsics, (poses.shape[0], 4))

    def iteration(_, state):
        poses, disps = state

        blk = build_system_blocks(
            target[None],
            weight[None],
            poses[None],
            disps[None],
            intr_full[None],
            ii,
            jj,
            min_depth=min_depth,
        )
        Hii, Hij = blk["Hii"][0], blk["Hij"][0]
        Hji, Hjj = blk["Hji"][0], blk["Hjj"][0]
        vi, vj = blk["vi"][0], blk["vj"][0]
        Ei, Ej = blk["Ei"][0], blk["Ej"][0]
        Ck, wk = blk["Ck"][0], blk["wk"][0]

        iiw = ii - t0
        jjw = jj - t0
        ii_ok = (iiw >= 0) & (iiw < P)
        jj_ok = (jjw >= 0) & (jjw < P)

        Hmat = (
            _scatter_blocks(Hii, iiw, iiw, ii_ok & ii_ok, P)
            + _scatter_blocks(Hij, iiw, jjw, ii_ok & jj_ok, P)
            + _scatter_blocks(Hji, jjw, iiw, jj_ok & ii_ok, P)
            + _scatter_blocks(Hjj, jjw, jjw, jj_ok & jj_ok, P)
        )
        v = (
            jnp.zeros((P + 1, 6))
            .at[jnp.where(ii_ok, iiw, P)].add(jnp.where(ii_ok[:, None], vi, 0.0))
            .at[jnp.where(jj_ok, jjw, P)].add(jnp.where(jj_ok[:, None], vj, 0.0))
        )[:P]

        A_pose = _pose_matrix(Hmat, P)
        v_flat = v.reshape(6 * P)

        if motion_only:
            dx = _damped_solve(A_pose, v_flat, lm, ep).reshape(P, 6)
        else:
            # depth diagonal + rhs with RGB-D prior mixing (alpha = 0.05)
            seg = jnp.clip(ii, 0, M - 1)
            C = jax.ops.segment_sum(Ck, seg, num_segments=M)
            w = jax.ops.segment_sum(wk, seg, num_segments=M)
            dsens = disps_sens[:M].reshape(M, HW)
            m = (dsens > 0).astype(C.dtype)
            C = C + m * alpha + (1.0 - m) * eta.reshape(M, HW)
            w = w - m * alpha * (disps[:M].reshape(M, HW) - dsens)
            Q = 1.0 / C

            # E rows grouped per depth bucket: anchor row (sum of Ei) + edges' Ej
            A_rows = jax.ops.segment_sum(Ei, seg, num_segments=M)  # [M,6,HW]
            Gedges = Ej[bucket_edges] * bucket_mask[..., None, None]  # [M,R-?,6,HW]
            G = jnp.concatenate([A_rows[:, None], Gedges], axis=1)  # [M,R,6,HW]
            pose_idx = jnp.concatenate(
                [jnp.arange(M)[:, None] - t0, jjw[bucket_edges]], axis=1
            )  # [M,R]
            row_ok = jnp.concatenate(
                [jnp.ones((M, 1), bool), bucket_mask], axis=1
            ) & (pose_idx >= 0) & (pose_idx < P)

            GQ = G * Q[:, None, None, :]
            Sk = jnp.einsum("mrah,msbh->mrsab", GQ, G)  # [M,R,R,6,6]
            pair_ok = row_ok[:, :, None] & row_ok[:, None, :]
            S = _scatter_blocks(
                Sk, pose_idx[:, :, None], pose_idx[:, None, :], pair_ok, P
            )

            # rhs reduction: v' = v - E Q w
            Ew = jnp.einsum("mrah,mh->mra", GQ, w)  # [M,R,6]
            Ew = jnp.where(row_ok[..., None], Ew, 0.0)
            vE = (
                jnp.zeros((P + 1, 6))
                .at[jnp.where(row_ok, pose_idx, P).reshape(-1)]
                .add(Ew.reshape(-1, 6))
            )[:P]

            S_pose = A_pose - _pose_matrix(S, P)
            rhs = v_flat - vE.reshape(6 * P)
            dx = _damped_solve(S_pose, rhs, lm, ep).reshape(P, 6)

            # back-substitute depths: dz = Q (w - E^T dx)
            dx_rows = jnp.where(
                row_ok[..., None], dx[jnp.clip(pose_idx, 0, P - 1)], 0.0
            )  # [M,R,6]
            Etdx = jnp.einsum("mrah,mra->mh", G, dx_rows)
            dz = Q * (w - Etdx)

            disps = disps.at[:M].add(dz.reshape(M, H, W))

        dx_full = jnp.zeros((poses.shape[0], 6)).at[t0:t1].set(dx)
        poses = se3_retr(poses, dx_full)
        return poses, disps

    poses, disps = jax.lax.fori_loop(0, iterations, iteration, (poses, disps))
    return poses, disps
