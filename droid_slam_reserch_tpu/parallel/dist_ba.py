"""Distributed dense bundle adjustment over a device mesh.

The TPU-native answer to "global BA over 500+ keyframes" (SURVEY.md §2.7
"map/sequence parallelism over keyframes"): the window's depth buckets are
split into contiguous per-shard ranges; every edge lives on the shard that
owns its source frame's depth bucket, so per-edge GN blocks and the depth
Schur elimination are fully local.  Two design rules make it scale:

1. **Edge-balanced partitioning.**  Range boundaries are chosen so every
   shard owns ~nE/S edges (not MW/S buckets) — one hot keyframe no longer
   makes every shard pay the global-max padding (the round-3 scaling
   anti-result).  Ranges have different lengths; shapes stay static by
   padding rows to the longest range and masking.
2. **Platform-matched pose-system exchange** (static ``exchange`` arg):

   - ``"gather_root"`` (CPU default): per-edge pose blocks and per-bucket
     Schur blocks are all_gathered in block-sparse form (~constant bytes
     because the partitioning is edge-balanced); only shard 0 scatters
     them into the dense [6MW, 6MW] system and runs the damped Cholesky,
     broadcasting dx with one psum (73 KB at MW=512).  Right where
     scatter-adds are cheap and cores are shared: the serial residue is
     one assembly+factorization (~0.43 s at MW=512 on one CPU core).
   - ``"dense_psum"`` (TPU default): each shard scatters its OWN blocks
     into the dense [MW, MW, 6, 6] Hessian and Schur tensors locally and
     the dense tensors are psum'd; the damped Cholesky is replicated.
     Right on TPU, where scatter-adds SERIALIZE (~8.6 us/block measured
     on v5e: a root-side scatter of all 58k blocks at MW=512 would cost
     ~0.5 s serial, while per-shard local scatters run in parallel at
     ~K/S blocks each) and the MXU factorizes 3072^2 in 4.8 ms; the
     2 x 37.8 MB dense psums cost ~1.7 ms on one v5e ICI link.

Comm volume per GN iteration (fp32), gather_root: all_gather pose blocks
4*nE*(36+2)*4 B, all_gather Schur blocks ~MW*(R+1)^2*36*4 B + indices,
psum v/vE/dx 3*6*MW*4 B — ~8 MB at MW=512/deg-8.  dense_psum: two dense
[MW,MW,6,6] psums = 2*36*MW^2*4 B (75 MB at MW=512) + the small psums.
Either rides ICI in low single-digit ms; the shard-local block build +
Schur einsum (O(nE*HW) and O(MW*R^2*HW) FLOPs) is what scales.

``partition_edges`` does the host-side bucketing; ``dist_ba_solve`` is the
shard_map program.  Numerically identical to ba_solve (tested).
Reference seam replaced: the serial CPU Schur pairing + fp64 Eigen solve,
src/droid_kernels.cu:1244-1272,1376-1413.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ba.solver import schur_pairs, _scatter_blocks, _pose_matrix, _mask_fixed, _damped_solve
from ..ba.system import build_system_blocks
from ..lie import se3_retr


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def partition_edges(ii, jj, target, weight, MW, n_shards, edge_bucket=8):
    """Host-side: split [0, MW) into contiguous bucket ranges with ~equal
    EDGE counts and group edges by owning shard.

    Each shard's edge list is padded to the common bucketed length with
    (first-owned-bucket, first-owned-bucket) zero-weight self-edges; bucket
    tables are local (rows = owned buckets, padded to the longest range).

    Returns (ii_s, jj_s, tgt_s, wgt_s, be_s, bm_s, k0, rlen) with a leading
    shard axis on the first six and per-shard range start/length in the
    last two ([S] int32 each).
    """
    assert MW >= n_shards, (MW, n_shards)
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    nE = len(ii)

    counts = np.bincount(ii, minlength=MW) if nE else np.zeros(MW, np.int64)
    cum = np.cumsum(counts)
    bounds = [0]
    for s in range(1, n_shards):
        tgt = int(round(s * nE / n_shards))
        b = int(np.searchsorted(cum, tgt))
        b = max(b, bounds[-1] + 1)          # at least one bucket per shard
        b = min(b, MW - (n_shards - s))     # leave buckets for later shards
        bounds.append(b)
    bounds.append(MW)
    k0 = np.asarray(bounds[:-1], np.int32)
    k1 = np.asarray(bounds[1:], np.int32)
    rlen = (k1 - k0).astype(np.int32)
    max_range = int(rlen.max())

    groups = [np.where((ii >= k0[s]) & (ii < k1[s]))[0] for s in range(n_shards)]
    n_max = max(max((len(g) for g in groups), default=1), 1)
    n_max = _round_up(n_max, edge_bucket)
    Rmax = int(counts.max()) if nE else 1
    Rmax = max(Rmax, 1)

    ii_s = np.zeros((n_shards, n_max), np.int32)
    jj_s = np.zeros((n_shards, n_max), np.int32)
    tgt_s = np.zeros((n_shards, n_max) + tuple(target.shape[1:]), np.float32)
    wgt_s = np.zeros((n_shards, n_max) + tuple(weight.shape[1:]), np.float32)
    be_s = np.zeros((n_shards, max_range, Rmax), np.int32)
    bm_s = np.zeros((n_shards, max_range, Rmax), bool)
    for s, g in enumerate(groups):
        n = len(g)
        ii_s[s, :n] = ii[g]
        jj_s[s, :n] = jj[g]
        ii_s[s, n:] = k0[s]  # padding anchored in the first owned bucket
        jj_s[s, n:] = k0[s]
        if n:
            tgt_s[s, :n] = np.asarray(target[g])
            wgt_s[s, :n] = np.asarray(weight[g])
        # Rmax bounds the REAL per-bucket degree; padded edges land in
        # bucket k0 AFTER the real ones (they sit at positions >= n and
        # schur_pairs fills in edge order), so truncation at Rmax can only
        # ever drop zero-weight padding, never a real edge
        be, bm = schur_pairs(ii_s[s] - k0[s], int(rlen[s]), max_deg=Rmax)
        be_s[s, : rlen[s]] = be
        bm_s[s, : rlen[s]] = bm
        # padded edges carry zero weight, but keep the mask exact
        bm_s[s] &= be_s[s] < max(n, 1)
        if n == 0:
            bm_s[s] &= False
    return ii_s, jj_s, tgt_s, wgt_s, be_s, bm_s, k0, rlen


def resolve_exchange(exchange="auto"):
    """'auto' -> dense_psum on TPU meshes (parallel local scatters, MXU
    Cholesky), gather_root elsewhere (serial scatter is cheap on CPU and
    replicating it across shared cores is not)."""
    if exchange != "auto":
        return exchange
    return "dense_psum" if jax.devices()[0].platform == "tpu" else "gather_root"


@partial(
    jax.jit,
    static_argnames=("mesh", "axis", "iterations", "lm", "ep", "alpha",
                     "min_depth", "exchange"),
)
def dist_ba_solve(
    mesh,
    poses,
    disps,
    intrinsics,
    disps_sens,
    target_s,
    weight_s,
    eta,
    ii_s,
    jj_s,
    free_mask,
    bucket_edges_s,
    bucket_mask_s,
    k0_s,
    rlen_s,
    iterations=2,
    lm=1e-4,
    ep=0.1,
    alpha=0.05,
    min_depth=0.25,
    axis="kf",
    exchange="gather_root",
):
    """Distributed windowed BA.  poses/disps/eta/free_mask are replicated
    [MW, ...]; *_s arrays carry a leading shard axis from partition_edges.
    Returns updated (poses, disps), replicated.  ``exchange`` must be
    pre-resolved (resolve_exchange) — see the module docstring for the
    two strategies.

    The whole solve (shard_map + iteration loop) is one jitted program —
    shard_map outside jit would execute op-by-op (measured 24x slower on the
    virtual mesh) and retrace on every call.
    """
    MW = poses.shape[0]
    n_shards = mesh.devices.size
    max_range = bucket_edges_s.shape[1]
    H, W = disps.shape[-2:]
    HW = H * W

    intr_full = jnp.broadcast_to(intrinsics, (MW, 4))
    free = free_mask.astype(jnp.float32)
    free6 = jnp.repeat(free, 6)

    # pad the replicated depth-side arrays by max_range rows so every shard
    # dynamic-slices a full [k0, k0 + max_range) block without clamping
    # (rows past a shard's real range are masked out of dz)
    zpad = jnp.zeros((max_range, H, W))
    dsens_pad = jnp.concatenate([disps_sens, zpad], axis=0)
    eta_pad = jnp.concatenate([eta, jnp.ones((max_range, H, W))], axis=0)

    # scatter map for the per-shard dz rows back into the padded buffer
    # (invalid rows carry dz == 0 — any clipped destination is harmless)
    dz_rows = jnp.clip(
        k0_s[:, None].astype(jnp.int32) + jnp.arange(max_range, dtype=jnp.int32)[None],
        0, MW + max_range - 1,
    ).reshape(-1)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(axis)),
        # the psum-broadcast dx is replicated but the varying-axes checker
        # cannot see through the root-only lax.cond; disable the check
        check_vma=False,
    )
    def one_iteration(poses, disps_pad, target, weight, ii, jj,
                      bucket_edges, bucket_mask, k0_a, rlen_a,
                      eta_pad, dsens_pad):
        """target/weight/ii/jj/bucket_*/k0/rlen: local shard slices."""
        target, weight = target[0], weight[0]
        ii, jj = ii[0], jj[0]
        bucket_edges, bucket_mask = bucket_edges[0], bucket_mask[0]
        k0 = k0_a[0]
        rlen = rlen_a[0]
        shard_id = jax.lax.axis_index(axis)
        disps = disps_pad[:MW]

        blk = build_system_blocks(
            target[None], weight[None], poses[None], disps[None], intr_full[None],
            ii, jj, min_depth=min_depth,
        )
        Hii, Hij = blk["Hii"][0], blk["Hij"][0]
        Hji, Hjj = blk["Hji"][0], blk["Hjj"][0]
        vi, vj = blk["vi"][0], blk["vj"][0]
        Ei, Ej = blk["Ei"][0], blk["Ej"][0]
        Ck, wk = blk["Ck"][0], blk["wk"][0]

        # pose rhs: small, scatter locally and psum
        v = jnp.zeros((MW, 6)).at[ii].add(vi).at[jj].add(vj)
        v = jax.lax.psum(v, axis) * free[:, None]

        # local depth buckets (global ii -> local row = ii - k0)
        ii_loc = ii - k0
        C = jax.ops.segment_sum(Ck, ii_loc, num_segments=max_range)
        w = jax.ops.segment_sum(wk, ii_loc, num_segments=max_range)
        dsl = lambda b: jax.lax.dynamic_slice_in_dim(b, k0, max_range).reshape(max_range, HW)
        dsens_l = dsl(dsens_pad)
        dloc = dsl(disps_pad)
        eta_loc = dsl(eta_pad)
        m = (dsens_l > 0).astype(C.dtype)
        C = C + m * alpha + (1.0 - m) * eta_loc
        w = w - m * alpha * (dloc - dsens_l)
        Q = 1.0 / C

        rows_real = jnp.arange(max_range, dtype=jnp.int32) < rlen
        A_rows = jax.ops.segment_sum(Ei, ii_loc, num_segments=max_range)
        Gedges = Ej[bucket_edges] * bucket_mask[..., None, None]
        G = jnp.concatenate([A_rows[:, None], Gedges], axis=1)
        pose_idx = jnp.concatenate(
            [(jnp.arange(max_range, dtype=ii.dtype) + k0)[:, None], jj[bucket_edges]],
            axis=1,
        )
        pose_idx = jnp.clip(pose_idx, 0, MW - 1)
        row_ok = (
            jnp.concatenate([jnp.ones((max_range, 1), bool), bucket_mask], axis=1)
            & free_mask[pose_idx]
            & rows_real[:, None]
        )

        GQ = G * Q[:, None, None, :]
        Sk = jnp.einsum("mrah,msbh->mrsab", GQ, G, preferred_element_type=jnp.float32)
        pair_ok = row_ok[:, :, None] & row_ok[:, None, :]
        Ew = jnp.where(row_ok[..., None], jnp.einsum("mrah,mh->mra", GQ, w), 0.0)
        vE = (
            jnp.zeros((MW + 1, 6))
            .at[jnp.where(row_ok, pose_idx, MW).reshape(-1)]
            .add(Ew.reshape(-1, 6))
        )[:MW]
        vE = jax.lax.psum(vE, axis)

        blocks = jnp.stack([Hii, Hij, Hji, Hjj], 0)      # [4, nE, 6, 6]
        bi = jnp.stack([ii, ii, jj, jj], 0)
        bj = jnp.stack([ii, jj, ii, jj], 0)

        if exchange == "dense_psum":
            # TPU strategy: scatter LOCAL blocks densely (per-shard
            # scatters run in parallel; TPU scatter-adds serialize, so
            # centralizing them on a root would cost S times more wall
            # clock), psum the dense tensors over ICI, factorize
            # replicated on the MXU
            Hl = _scatter_blocks(blocks, bi, bj, jnp.ones(bi.shape, bool), MW)
            Hmat = jax.lax.psum(Hl, axis)
            Sl = _scatter_blocks(
                Sk, pose_idx[:, :, None], pose_idx[:, None, :], pair_ok, MW
            )
            Smat = jax.lax.psum(Sl, axis)
            A_pose = _mask_fixed(_pose_matrix(Hmat, MW), free6)
            S_pose = A_pose - _pose_matrix(Smat, MW)
            rhs = v.reshape(6 * MW) - (vE * free[:, None]).reshape(6 * MW)
            dx_flat = _damped_solve(S_pose, rhs, lm, ep)
        else:
            # CPU strategy: block-sparse all_gathers (~constant total
            # bytes, edge-balanced), root-only dense assembly + damped
            # Cholesky, dx broadcast by psum
            blocks_g = jax.lax.all_gather(blocks, axis)   # [S, 4, nE, 6, 6]
            bi_g = jax.lax.all_gather(bi, axis)
            bj_g = jax.lax.all_gather(bj, axis)
            Sk_g = jax.lax.all_gather(Sk, axis)
            pi_g = jax.lax.all_gather(pose_idx, axis)
            ok_g = jax.lax.all_gather(pair_ok, axis)

            def root_solve(_):
                Hmat = _scatter_blocks(
                    blocks_g, bi_g, bj_g, jnp.ones(bi_g.shape, bool), MW
                )
                A_pose = _mask_fixed(_pose_matrix(Hmat, MW), free6)
                S = _scatter_blocks(
                    Sk_g, pi_g[..., :, None], pi_g[..., None, :], ok_g, MW
                )
                S_pose = A_pose - _pose_matrix(S, MW)
                rhs = v.reshape(6 * MW) - (vE * free[:, None]).reshape(6 * MW)
                return _damped_solve(S_pose, rhs, lm, ep)

            dx_flat = jax.lax.cond(
                shard_id == 0, root_solve, lambda _: jnp.zeros(6 * MW), None
            )
            dx_flat = jax.lax.psum(dx_flat, axis)
        dx = dx_flat.reshape(MW, 6) * free[:, None]

        # local depth back-substitution
        dx_rows = jnp.where(row_ok[..., None], dx[pose_idx], 0.0)
        Etdx = jnp.einsum("mrah,mra->mh", G, dx_rows)
        dz = Q * (w - Etdx) * rows_real[:, None].astype(Q.dtype)

        poses = se3_retr(poses, dx)
        return poses, dz.reshape(1, max_range, H, W)

    disps_pad = jnp.concatenate([disps, zpad], axis=0)
    for _ in range(iterations):
        poses, dz = one_iteration(
            poses, disps_pad, target_s, weight_s, ii_s, jj_s,
            bucket_edges_s, bucket_mask_s, k0_s, rlen_s, eta_pad, dsens_pad,
        )
        disps_pad = disps_pad.at[dz_rows].add(
            dz.reshape(n_shards * max_range, H, W)
        )
    return poses, disps_pad[:MW]
