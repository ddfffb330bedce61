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
  S = E Q E^T blocks become one batched matmul that rides the MXU.
- **Windowed, mask-based formulation**: the solver operates on a window of
  MW frames with *local* indices and a dynamic ``free_mask`` selecting
  optimizable poses (the reference's [t0, t1) window).  Fixed poses are
  eliminated with identity rows, so the jit signature depends only on the
  (bucketed) window size and edge count — the engine never recompiles as
  t1 grows.

Semantics preserved: per-edge blocks from ``build_system_blocks`` (the
projective_transform_kernel analog), RGB-D prior mixing with alpha = 0.05
(droid_kernels.cu:1395-1400), damping diag*(1+lm) + ep, retraction via
se3_retr, motion_only branch (droid_kernels.cu:1385-1392).  Edges padded
as (0, 0) self-edges with zero weight contribute exactly nothing.
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


_ONEHOT_SCATTER_MAX = 64  # window size bound for the one-hot formulation


def _scatter_blocks(vals, pi, pj, valid, P):
    """Scatter-add [..., 6, 6] blocks into dense [P, P, 6, 6].

    Small windows (the frontend's MW <= 48) use a one-hot MXU contraction —
    TPU scatter-adds lower to serialized updates and dominate the BA step
    (~1 ms/solve measured on v5e); the einsum is a single fused matmul.
    Large windows (global backend) keep the scatter: the [K, P*P] one-hot
    would be gigabytes at 500 keyframes.
    """
    idx = jnp.where(valid, pi * P + pj, P * P)
    flat_idx = idx.reshape(-1)
    flat_vals = jnp.where(valid[..., None, None], vals, 0.0).reshape(-1, 6, 6)
    if P <= _ONEHOT_SCATTER_MAX:
        onehot = (
            flat_idx[:, None] == jnp.arange(P * P, dtype=flat_idx.dtype)
        ).astype(flat_vals.dtype)
        out = jnp.einsum(
            "kq,kab->qab", onehot, flat_vals,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(P, P, 6, 6)
    out = jnp.zeros((P * P + 1, 6, 6), vals.dtype)
    out = out.at[flat_idx].add(flat_vals)
    return out[: P * P].reshape(P, P, 6, 6)


def _pose_matrix(Hblocks, P):
    """[P, P, 6, 6] -> [6P, 6P]."""
    return Hblocks.transpose(0, 2, 1, 3).reshape(6 * P, 6 * P)


def _mask_fixed(A, free6):
    """Identity rows/cols for fixed poses: eliminates them from the system."""
    A = A * free6[:, None] * free6[None, :]
    return A + jnp.diag(1.0 - free6)


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


def ba_iterations(
    poses,
    disps,
    intrinsics,
    disps_sens,
    target,
    weight,
    eta,
    ii,
    jj,
    free_mask,
    bucket_edges,
    bucket_mask,
    iterations=2,
    lm=1e-4,
    ep=0.1,
    motion_only=False,
    alpha=0.05,
    min_depth=0.25,
    use_pallas=False,
):
    """Windowed dense bundle adjustment with local frame indices.

    poses: [MW, 7]; disps/disps_sens: [MW, H, W]; intrinsics: [4] (1/8 res);
    target/weight: [N, H, W, 2]; eta: [MW, H, W] per-frame damping;
    ii/jj: [N] *local* edge indices in [0, MW); free_mask: [MW] bool —
    poses to optimize (depths of all MW frames are optimized, like the
    reference's kx buckets); bucket_edges/bucket_mask from
    ``schur_pairs(ii, MW)``.  Returns updated (poses, disps).
    """
    MW = poses.shape[0]
    H, W = disps.shape[-2:]
    HW = H * W

    intr_full = jnp.broadcast_to(intrinsics, (MW, 4))
    free = free_mask.astype(jnp.float32)
    free6 = jnp.repeat(free, 6)

    def iteration(_, state):
        poses, disps = state

        if use_pallas:
            # fused Pallas system builder — Jacobians never materialized
            from ..geom.projective import relative_poses
            from ..lie import quat_to_matrix
            from ..ops.pallas_ba import build_system_blocks_pallas

            Gij = relative_poses(poses[None], ii, jj)[0]
            blk = build_system_blocks_pallas(
                target.transpose(0, 3, 1, 2), weight.transpose(0, 3, 1, 2),
                quat_to_matrix(Gij[:, 3:7]), Gij[:, :3], disps[ii],
                intrinsics, ii != jj, min_depth=min_depth,
            )
            Hii, Hij, Hji, Hjj = blk["Hii"], blk["Hij"], blk["Hji"], blk["Hjj"]
            vi, vj, Ei, Ej = blk["vi"], blk["vj"], blk["Ei"], blk["Ej"]
            Ck, wk = blk["Ck"], blk["wk"]
        else:
            blk = build_system_blocks(
                target[None], weight[None], poses[None], disps[None], intr_full[None],
                ii, jj, min_depth=min_depth,
            )
            Hii, Hij = blk["Hii"][0], blk["Hij"][0]
            Hji, Hjj = blk["Hji"][0], blk["Hjj"][0]
            vi, vj = blk["vi"][0], blk["vj"][0]
            Ei, Ej = blk["Ei"][0], blk["Ej"][0]
            Ck, wk = blk["Ck"][0], blk["wk"][0]

        ok = jnp.ones_like(ii, dtype=bool)
        Hmat = (
            _scatter_blocks(Hii, ii, ii, ok, MW)
            + _scatter_blocks(Hij, ii, jj, ok, MW)
            + _scatter_blocks(Hji, jj, ii, ok, MW)
            + _scatter_blocks(Hjj, jj, jj, ok, MW)
        )
        v = (
            jnp.zeros((MW, 6)).at[ii].add(vi).at[jj].add(vj)
        )
        v = v * free[:, None]

        A_pose = _mask_fixed(_pose_matrix(Hmat, MW), free6)
        v_flat = v.reshape(6 * MW)

        if motion_only:
            dx = _damped_solve(A_pose, v_flat, lm, ep).reshape(MW, 6)
        else:
            # depth diagonal + rhs with RGB-D prior mixing (alpha = 0.05)
            C = jax.ops.segment_sum(Ck, ii, num_segments=MW)
            w = jax.ops.segment_sum(wk, ii, num_segments=MW)
            dsens = disps_sens.reshape(MW, HW)
            m = (dsens > 0).astype(C.dtype)
            C = C + m * alpha + (1.0 - m) * eta.reshape(MW, HW)
            w = w - m * alpha * (disps.reshape(MW, HW) - dsens)
            Q = 1.0 / C

            # E rows grouped per depth bucket: anchor row (sum of Ei) + edges' Ej
            A_rows = jax.ops.segment_sum(Ei, ii, num_segments=MW)  # [MW,6,HW]
            Gedges = Ej[bucket_edges] * bucket_mask[..., None, None]
            G = jnp.concatenate([A_rows[:, None], Gedges], axis=1)  # [MW,R,6,HW]
            pose_idx = jnp.concatenate(
                [jnp.arange(MW, dtype=ii.dtype)[:, None], jj[bucket_edges]], axis=1
            )  # [MW,R]
            row_ok = (
                jnp.concatenate([jnp.ones((MW, 1), bool), bucket_mask], axis=1)
                & free_mask[pose_idx]
            )

            GQ = G * Q[:, None, None, :]
            Sk = jnp.einsum(
                "mrah,msbh->mrsab", GQ, G, preferred_element_type=jnp.float32
            )
            pair_ok = row_ok[:, :, None] & row_ok[:, None, :]
            S = _scatter_blocks(Sk, pose_idx[:, :, None], pose_idx[:, None, :], pair_ok, MW)

            # rhs reduction: v' = v - E Q w
            Ew = jnp.einsum("mrah,mh->mra", GQ, w)
            Ew = jnp.where(row_ok[..., None], Ew, 0.0)
            vE = (
                jnp.zeros((MW + 1, 6))
                .at[jnp.where(row_ok, pose_idx, MW).reshape(-1)]
                .add(Ew.reshape(-1, 6))
            )[:MW]

            S_pose = A_pose - _pose_matrix(S, MW)
            rhs = v_flat - (vE * free[:, None]).reshape(6 * MW)
            dx = _damped_solve(S_pose, rhs, lm, ep).reshape(MW, 6)
            dx = dx * free[:, None]

            # back-substitute depths: dz = Q (w - E^T dx)
            dx_rows = jnp.where(row_ok[..., None], dx[pose_idx], 0.0)
            Etdx = jnp.einsum("mrah,mra->mh", G, dx_rows)
            dz = Q * (w - Etdx)
            disps = disps + dz.reshape(MW, H, W)

        dx = dx * free[:, None]
        poses = se3_retr(poses, dx)
        return poses, disps

    poses, disps = jax.lax.fori_loop(0, iterations, iteration, (poses, disps))
    return poses, disps


# jitted entry point; ba_iterations stays pure so fused engine programs can
# inline the same math inside a larger jit (factor_graph._fused_rounds)
ba_solve = jax.jit(
    ba_iterations,
    static_argnames=("iterations", "motion_only", "alpha", "min_depth", "use_pallas"),
)
