"""Distributed dense bundle adjustment over a device mesh.

The TPU-native answer to "global BA over 500+ keyframes" (SURVEY.md §2.7
"map/sequence parallelism over keyframes"): the window's depth buckets are
sharded contiguously across devices; every edge lives on the device that
owns its source frame's depth bucket, so

- per-edge GN blocks and the depth Schur elimination are fully local,
- only the small pose system (6 MW x 6 MW blocks + rhs) crosses devices,
  reduced with one psum over the mesh axis,
- the pose Cholesky solve is replicated (cheap), and the depth
  back-substitution is again local.

``partition_edges`` does the host-side bucketing; ``dist_ba_solve`` is the
shard_map program.  Numerically identical to ba_solve (tested).
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


def partition_edges(ii, jj, target, weight, MW, n_shards, edge_bucket=8):
    """Host-side: group edges by owning shard (contiguous depth buckets).

    Shard s owns buckets [s*MW/n, (s+1)*MW/n); every edge goes to the shard
    owning its source frame ii.  Each shard's edge list is padded to the
    common bucketed length with (first-bucket, first-bucket) zero-weight
    self-edges.  Returns stacked arrays with a leading shard axis plus the
    per-shard local bucket tables.
    """
    assert MW % n_shards == 0, (MW, n_shards)
    mw_local = MW // n_shards
    ii = np.asarray(ii)
    jj = np.asarray(jj)

    groups = [np.where((ii >= s * mw_local) & (ii < (s + 1) * mw_local))[0] for s in range(n_shards)]
    n_max = max(max((len(g) for g in groups), default=1), 1)
    n_max = ((n_max + edge_bucket - 1) // edge_bucket) * edge_bucket

    ii_s = np.zeros((n_shards, n_max), np.int32)
    jj_s = np.zeros((n_shards, n_max), np.int32)
    tgt_s = np.zeros((n_shards, n_max) + target.shape[1:], np.float32)
    wgt_s = np.zeros((n_shards, n_max) + weight.shape[1:], np.float32)
    be_list, bm_list = [], []
    Rmax = 1
    for s, g in enumerate(groups):
        n = len(g)
        ii_s[s, :n] = ii[g]
        jj_s[s, :n] = jj[g]
        ii_s[s, n:] = s * mw_local  # padding anchored in an owned bucket
        jj_s[s, n:] = s * mw_local
        if n:
            tgt_s[s, :n] = np.asarray(target[g])
            wgt_s[s, :n] = np.asarray(weight[g])
        be, bm = schur_pairs(ii_s[s] - s * mw_local, mw_local)
        be_list.append(be)
        bm_list.append(bm)
        Rmax = max(Rmax, be.shape[1])
    be_s = np.zeros((n_shards, mw_local, Rmax), np.int32)
    bm_s = np.zeros((n_shards, mw_local, Rmax), bool)
    for s in range(n_shards):
        # drop padded edges from the bucket tables (they carry zero weight
        # anyway, but keeping them out makes the mask exact)
        be_s[s, :, : be_list[s].shape[1]] = be_list[s]
        bm_s[s, :, : bm_list[s].shape[1]] = bm_list[s]
        n = len(groups[s])
        bm_s[s] &= be_s[s] < max(n, 1)
        if n == 0:
            bm_s[s] &= False
    return ii_s, jj_s, tgt_s, wgt_s, be_s, bm_s


@partial(
    jax.jit,
    static_argnames=("mesh", "axis", "iterations", "lm", "ep", "alpha",
                     "min_depth"),
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
    iterations=2,
    lm=1e-4,
    ep=0.1,
    alpha=0.05,
    min_depth=0.25,
    axis="kf",
):
    """Distributed windowed BA.  poses/disps/eta/free_mask are replicated
    [MW, ...]; *_s arrays carry a leading shard axis from partition_edges.
    Returns updated (poses, disps), replicated.

    The whole solve (shard_map + iteration loop) is one jitted program —
    shard_map outside jit would execute op-by-op (measured 24x slower on the
    virtual mesh) and retrace on every call.
    """
    MW = poses.shape[0]
    n_shards = mesh.devices.size
    mw_local = MW // n_shards
    H, W = disps.shape[-2:]
    HW = H * W

    intr_full = jnp.broadcast_to(intrinsics, (MW, 4))
    free = free_mask.astype(jnp.float32)
    free6 = jnp.repeat(free, 6)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis)),
        # the pose system is rebuilt identically on every shard from
        # all_gathered blocks; the varying-axes checker cannot infer that
        # all_gather outputs are replicated, so the check is disabled
        check_vma=False,
    )
    def one_iteration(poses, disps, target, weight, ii, jj, bucket_edges, bucket_mask, eta_r):
        """target/weight/ii/jj/bucket_*: local shard slices (leading axis 1)."""
        target, weight = target[0], weight[0]
        ii, jj = ii[0], jj[0]
        bucket_edges, bucket_mask = bucket_edges[0], bucket_mask[0]

        shard_id = jax.lax.axis_index(axis)
        k0 = shard_id * mw_local  # first owned bucket (global index)

        blk = build_system_blocks(
            target[None], weight[None], poses[None], disps[None], intr_full[None],
            ii, jj, min_depth=min_depth,
        )
        Hii, Hij = blk["Hii"][0], blk["Hij"][0]
        Hji, Hjj = blk["Hji"][0], blk["Hjj"][0]
        vi, vj = blk["vi"][0], blk["vj"][0]
        Ei, Ej = blk["Ei"][0], blk["Ej"][0]
        Ck, wk = blk["Ck"][0], blk["wk"][0]

        # cross-device exchange of the pose system in BLOCK-SPARSE form:
        # all_gather the per-edge 6x6 blocks (+ indices) and scatter after —
        # ~144 B/edge on the wire instead of psum'ing the dense
        # [MW, MW, 6, 6] Hessian (37.8 MB at MW=512), which does not scale
        # past a few hundred keyframes replicated per device.
        blocks = jnp.stack([Hii, Hij, Hji, Hjj], 0)      # [4, nE, 6, 6]
        bi = jnp.stack([ii, ii, jj, jj], 0)
        bj = jnp.stack([ii, jj, ii, jj], 0)
        blocks_g = jax.lax.all_gather(blocks, axis)       # [S, 4, nE, 6, 6]
        bi_g = jax.lax.all_gather(bi, axis)
        bj_g = jax.lax.all_gather(bj, axis)
        Hmat = _scatter_blocks(
            blocks_g, bi_g, bj_g, jnp.ones(bi_g.shape, bool), MW
        )
        v = jnp.zeros((MW, 6)).at[ii].add(vi).at[jj].add(vj)
        v = jax.lax.psum(v, axis) * free[:, None]
        A_pose = _mask_fixed(_pose_matrix(Hmat, MW), free6)
        v_flat = v.reshape(6 * MW)

        # local depth buckets (global ii -> local bucket = ii - k0)
        ii_loc = ii - k0
        C = jax.ops.segment_sum(Ck, ii_loc, num_segments=mw_local)
        w = jax.ops.segment_sum(wk, ii_loc, num_segments=mw_local)
        dsens = jax.lax.dynamic_slice_in_dim(disps_sens, k0, mw_local).reshape(mw_local, HW)
        dloc = jax.lax.dynamic_slice_in_dim(disps, k0, mw_local).reshape(mw_local, HW)
        eta_loc = jax.lax.dynamic_slice_in_dim(eta_r, k0, mw_local).reshape(mw_local, HW)
        m = (dsens > 0).astype(C.dtype)
        C = C + m * alpha + (1.0 - m) * eta_loc
        w = w - m * alpha * (dloc - dsens)
        Q = 1.0 / C

        A_rows = jax.ops.segment_sum(Ei, ii_loc, num_segments=mw_local)
        Gedges = Ej[bucket_edges] * bucket_mask[..., None, None]
        G = jnp.concatenate([A_rows[:, None], Gedges], axis=1)
        pose_idx = jnp.concatenate(
            [(jnp.arange(mw_local, dtype=ii.dtype) + k0)[:, None], jj[bucket_edges]],
            axis=1,
        )
        row_ok = (
            jnp.concatenate([jnp.ones((mw_local, 1), bool), bucket_mask], axis=1)
            & free_mask[pose_idx]
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

        # same block-sparse exchange for the Schur blocks: gather the
        # compact [mw_local, R+1, R+1, 6, 6] tensors, scatter once
        Sk_g = jax.lax.all_gather(Sk, axis)
        pi_g = jax.lax.all_gather(pose_idx, axis)
        ok_g = jax.lax.all_gather(pair_ok, axis)
        S = _scatter_blocks(
            Sk_g, pi_g[..., :, None], pi_g[..., None, :], ok_g, MW
        )
        vE = jax.lax.psum(vE, axis)

        S_pose = A_pose - _pose_matrix(S, MW)
        rhs = v_flat - (vE * free[:, None]).reshape(6 * MW)
        dx = _damped_solve(S_pose, rhs, lm, ep).reshape(MW, 6)
        dx = dx * free[:, None]

        dx_rows = jnp.where(row_ok[..., None], dx[pose_idx], 0.0)
        Etdx = jnp.einsum("mrah,mra->mh", G, dx_rows)
        dz = Q * (w - Etdx)

        poses = se3_retr(poses, dx)
        return poses, dz.reshape(1, mw_local, H, W)

    for _ in range(iterations):
        poses, dz = one_iteration(
            poses, disps, target_s, weight_s, ii_s, jj_s,
            bucket_edges_s, bucket_mask_s, eta,
        )
        disps = disps + dz.reshape(MW, H, W)
    return poses, disps
