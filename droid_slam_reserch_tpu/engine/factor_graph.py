"""Covisibility factor graph (reference factor_graph.py:11-379).

Host bookkeeping (add/remove/dedup/NMS — all data-dependent control flow,
as in the reference) runs in numpy or the native C++ library; the numeric
hot path is one fused jit program per *keyframe* (``_fused_rounds``):
correlation volume build -> K rounds of {reproject -> motion features ->
volume lookup -> ConvGRU update -> aggregation -> dense BA}.

Design deltas vs the reference:
- correlation volumes are built on the MXU inside the fused program and
  sampled with scalar gathers; nothing persists between keyframes (the
  reference caches volume pyramids per edge, factor_graph.py:112-117);
- edge counts, BA windows, and Schur degrees are padded to buckets so jit
  signatures recur; the host pays one dispatch per keyframe.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ba.solver import ba_iterations, schur_pairs
from ..geom import frame_distance, projective_transform, coords_grid
from ..ops.corr import (
    altcorr_pyramid,
    build_pyramid_flat,
    corr_lookup_pyramid_flat,
    corr_lookup_windows,
    corr_volume_flat,
    extract_windows,
    pad_pyramid_flat,
    pool2x_fmap,
    window_bases,
    window_drift_ok,
)
from ..utils.config import resolve_pallas_ba
from ..ops.pallas_corr import (
    corr_build_pmajor_pallas,
    corr_build_windows_light_pallas,
    corr_lookup_blocked_pallas,
    corr_lookup_windows_pallas,
    window_drift_ok_pallas,
)


import os as _os

# Correlation lookup implementation for the frontend hot path:
#   pallas        — fused Pallas build + per-keyframe cached 24x24 windows
#                   with a drift-guarded exact fallback (default on TPU)
#   pallas_nowin  — fused Pallas build + full blocked lookup every round
#                   (3.7 ms/round vs 21.4 ms for the XLA one-hot path at
#                   EuRoC scale on v5e — see tools/profile_frontend.py)
#   flat          — XLA one-hot interpolation-matrix matmuls (default on
#                   CPU, where Pallas would run interpreted)
#   windows       — the old pure-XLA cached-window path (slower on v5e)
_CORR_IMPL = _os.environ.get("DROID_CORR", "auto")
_USE_CORR_WINDOWS = _CORR_IMPL == "windows"


def _corr_impl():
    if _CORR_IMPL != "auto":
        return _CORR_IMPL
    # the Pallas kernels use pltpu block specs — on any non-TPU backend
    # (CPU, GPU) they would only interpret or fail to lower, so auto picks
    # them exclusively on TPU
    return "pallas" if jax.devices()[0].platform == "tpu" else "flat"


def _build_corr_lookup(f1, f2, dtype):
    """Build the per-keyframe correlation pyramid; returns lookup(cflat
    [E,P,2]) -> [E,P,L*49] using the configured implementation."""
    if _corr_impl() in ("pallas", "pallas_nowin"):
        interp = jax.devices()[0].platform == "cpu"
        levels, pmeta, _ = corr_build_pmajor_pallas(
            f1, f2, dtype=dtype, interpret=interp
        )
        return lambda cflat: corr_lookup_blocked_pallas(
            levels, pmeta, cflat, interpret=interp
        )
    pyr = build_pyramid_flat(corr_volume_flat(f1, f2, dtype=dtype))
    return lambda cflat: corr_lookup_pyramid_flat(pyr, cflat)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("pad", "MW"))
def _gather_window(fmaps, inps, poses, disps, disps_sens, damping,
                   net, target, ii_p, jj_p, cams, m0, pad, MW):
    """All per-edge/window gathers for update_fused in ONE device program
    (host dispatch latency dominates these tiny ops)."""
    h8, w8 = disps.shape[-2:]
    C = net.shape[-1]
    fmap1_e = fmaps[ii_p, 0]
    fmap2_e = fmaps[jj_p, cams]
    nets_e = jnp.concatenate(
        [net, jnp.zeros((pad, h8, w8, C), net.dtype)], 0
    )
    inps_e = inps[ii_p]
    target_a = jnp.concatenate(
        [target, jnp.zeros((pad, h8, w8, 2), jnp.float32)], 0
    )
    dsl = lambda b: jax.lax.dynamic_slice_in_dim(b, m0, MW, axis=0)
    return (fmap1_e, fmap2_e, nets_e, inps_e, target_a,
            dsl(poses), dsl(disps), dsl(disps_sens), dsl(damping))


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_window(poses_buf, disps_buf, damping_buf, poses, disps,
                    damping, m0):
    """Write the solved window back into the ring buffers, one dispatch."""
    upd = jax.lax.dynamic_update_slice_in_dim
    return (
        upd(poses_buf, poses, m0, axis=0),
        upd(disps_buf, disps, m0, axis=0),
        upd(damping_buf, damping, m0, axis=0),
    )


@partial(jax.jit, static_argnames=("apply_fn", "num_segments", "dtype"))
def _update_op_step(
    apply_fn,
    params,
    poses,
    disps,
    intrinsics,
    fmaps,
    nets_e,
    inps_e,
    target,
    ii,
    jj,
    cams,
    kk,
    emask,
    num_segments,
    dtype=jnp.float32,
):
    """Fused per-edge update: reproject + motion + fused corr + GRU + agg.

    Mirrors reference factor_graph.py:198-234 (and the per-chunk body of
    update_lowmem :271-290) as a single XLA program.  emask [N] excludes
    padded edges from GraphAgg's per-frame mean (models/update.py:61-68
    has no implicit mask), so damping/upmask are never diluted by
    zero-state fakes.
    """
    h8, w8 = disps.shape[-2:]
    coords0 = coords_grid(h8, w8)

    coords1, _ = projective_transform(
        poses[None], disps[None], intrinsics[None], ii, jj
    )
    coords1 = coords1[0]
    motn = jnp.concatenate([coords1 - coords0, target - coords1], axis=-1)
    motn = jnp.clip(motn, -64.0, 64.0)

    # all-pairs correlation volume pyramid (MXU) + fused lookup (Pallas
    # P-major kernel on TPU, one-hot interp-matrix matmuls on CPU);
    # compute dtype (bf16 on TPU) halves every volume read
    f1 = fmaps[ii, 0]
    f2 = fmaps[jj, cams]
    E = f1.shape[0]
    lookup = _build_corr_lookup(f1, f2, dtype)
    corr = lookup(coords1.reshape(E, h8 * w8, 2)).reshape(E, h8, w8, -1)

    net, delta, weight, eta, upmask = apply_fn(
        params,
        nets_e[None],
        inps_e[None],
        corr[None].astype(dtype),
        motn[None].astype(dtype),
        kk,
        num_segments,
        emask,
    )

    target_new = coords1 + delta[0].astype(jnp.float32)
    weight_new = weight[0].astype(jnp.float32)
    return net[0], target_new, weight_new, eta[0].astype(jnp.float32), upmask[0], coords1


@partial(jax.jit, static_argnames=("apply_fn", "num_segments", "dtype"))
def _update_op_step_alt(
    apply_fn,
    params,
    poses,
    disps,
    intrinsics,
    fmaps,
    nets_e,
    inps_e,
    target,
    ii,
    jj,
    cams,
    kk,
    emask,
    num_segments,
    dtype=jnp.float32,
):
    """_update_op_step with the fused altcorr path: correlation is computed
    on the fly against a pooled FEATURE pyramid instead of materializing the
    O(E*(HW)^2) all-pairs volume pyramid — the TPU analog of the reference's
    backend AltCorrBlock (factor_graph.py:261, altcorr_kernel.cu:27-149),
    which exists exactly so global BA over hundreds of keyframes does not
    exhaust device memory."""
    h8, w8 = disps.shape[-2:]
    coords0 = coords_grid(h8, w8)

    coords1, _ = projective_transform(
        poses[None], disps[None], intrinsics[None], ii, jj
    )
    coords1 = coords1[0]
    motn = jnp.concatenate([coords1 - coords0, target - coords1], axis=-1)
    motn = jnp.clip(motn, -64.0, 64.0)

    f1 = fmaps[ii, 0].astype(dtype)
    f2 = fmaps[jj, cams].astype(dtype)
    f2_pyr = [f2]
    for _ in range(3):
        f2_pyr.append(pool2x_fmap(f2_pyr[-1]))
    corr = altcorr_pyramid(f1, f2_pyr, coords1)

    net, delta, weight, eta, upmask = apply_fn(
        params,
        nets_e[None],
        inps_e[None],
        corr[None].astype(dtype),
        motn[None].astype(dtype),
        kk,
        num_segments,
        emask,
    )

    target_new = coords1 + delta[0].astype(jnp.float32)
    weight_new = weight[0].astype(jnp.float32)
    return net[0], target_new, weight_new, eta[0].astype(jnp.float32), upmask[0], coords1


def _lowmem_chunk_step(apply_fn, params, poses, disps, intrinsics, fmaps,
                       inps, coords0, S, dtype, xs):
    """One chunk of the global-graph motion-feature refresh: reproject +
    fused altcorr + GRU + aggregation for up to EB edges whose source
    frames live in an S-frame band (the body of the reference's
    update_lowmem loop, factor_graph.py:271-290)."""
    ii, jj, cams, kk, frame_ids, emask, nets, target = xs

    coords1, _ = projective_transform(
        poses[None], disps[None], intrinsics[None], ii, jj
    )
    coords1 = coords1[0]
    motn = jnp.clip(
        jnp.concatenate([coords1 - coords0, target - coords1], axis=-1),
        -64.0, 64.0,
    )

    f1 = fmaps[ii, 0].astype(dtype)
    f2 = fmaps[jj, cams].astype(dtype)
    f2_pyr = [f2]
    for _ in range(3):
        f2_pyr.append(pool2x_fmap(f2_pyr[-1]))
    corr = altcorr_pyramid(f1, f2_pyr, coords1)

    # emask excludes padded fake edges from GraphAgg's per-frame mean —
    # with EB padded to the global max chunk size, sparse chunks would
    # otherwise dilute a real slot's eta/upmask with zero-state fakes
    nets, delta, weight, eta, upmask = apply_fn(
        params, nets[None], inps[ii][None], corr[None].astype(dtype),
        motn[None].astype(dtype), kk, S, emask,
    )
    nets = nets[0]
    target = coords1 + delta[0].astype(jnp.float32)
    weight = weight[0].astype(jnp.float32) * emask[:, None, None, None]
    return nets, target, weight, eta[0], upmask[0]


@partial(
    jax.jit,
    static_argnames=("apply_fn", "S", "dtype", "upsample"),
)
def _lowmem_refresh(
    apply_fn,
    params,
    poses,
    disps,
    disps_up,
    intrinsics,
    fmaps,
    inps,
    nets_ck,
    target_ck,
    ii_ck,
    jj_ck,
    cams_ck,
    kk_ck,
    frame_ck,
    emask_ck,
    damping,
    S,
    dtype=jnp.float32,
    upsample=False,
):
    """One full motion-feature refresh over every edge of a global graph,
    scanned chunk-by-chunk inside ONE device program.

    The reference's update_lowmem inner loop dispatches a kernel volley +
    host syncs per 8-source-frame chunk (reference factor_graph.py:253-296);
    here the chunks are padded to a static [nC, EB] layout on the host once
    and a lax.scan walks them on-device: correlation is the fused altcorr
    (pooled feature pyramid, no materialized volume — reference
    altcorr_kernel.cu:27-149), and target/weight/nets/damping never leave
    the device between chunks.

    poses [T,7], disps [T,h,w], intrinsics [T,4], fmaps [T,C,h,w,128],
    inps [T,h,w,128]; *_ck are [nC, EB] chunked edge arrays (emask_ck
    flags real edges), kk_ck in [0,S) maps edges to chunk frame slots,
    frame_ck [nC,S] global frame id per slot (T = no-edge sentinel).
    Returns (nets [nC,EB,..], target, weight, damping [T,h,w], disps_up).
    """
    T = poses.shape[0]
    h8, w8 = disps.shape[-2:]
    coords0 = coords_grid(h8, w8)
    damping_ext = jnp.concatenate([damping, jnp.zeros((1, h8, w8))], axis=0)

    def body(carry, xs):
        damping_ext, disps_up = carry
        frame_ids = xs[4]
        nets, target, weight, eta0, upmask0 = _lowmem_chunk_step(
            apply_fn, params, poses, disps, intrinsics, fmaps, inps,
            coords0, S, dtype, xs,
        )
        damping_ext = damping_ext.at[frame_ids].set(eta0.astype(jnp.float32))
        if upsample:
            d = jnp.clip(frame_ids, 0, T - 1)
            up = cvx_upsample_fn(
                disps[d][..., None], upmask0.astype(jnp.float32)
            )[..., 0]
            disps_up = disps_up.at[frame_ids].set(up)
        return (damping_ext, disps_up), (nets, target, weight)

    (damping_ext, disps_up), (nets, target, weight) = jax.lax.scan(
        body,
        (damping_ext, disps_up),
        (ii_ck, jj_ck, cams_ck, kk_ck, frame_ck, emask_ck, nets_ck, target_ck),
    )
    return nets, target, weight, damping_ext[:T], disps_up


@partial(
    jax.jit,
    static_argnames=("mesh", "apply_fn", "S", "dtype", "upsample"),
)
def _lowmem_refresh_sharded(
    mesh,
    apply_fn,
    params,
    poses,
    disps,
    disps_up,
    intrinsics,
    fmaps,
    inps,
    nets_ck,
    target_ck,
    ii_ck,
    jj_ck,
    cams_ck,
    kk_ck,
    frame_ck,
    emask_ck,
    damping,
    S,
    dtype=jnp.float32,
    upsample=False,
):
    """_lowmem_refresh with the chunk axis sharded over a local device mesh
    — the "ring-attention analog" of SURVEY.md §5: the GRU + altcorr sweep
    over all ~16t edges is embarrassingly parallel over source-frame
    chunks, so each device scans its own chunk slice against replicated
    frame state (reference chunking seam: factor_graph.py:253-298).

    Each frame belongs to exactly one chunk, so the per-frame damping /
    upsample outputs are combined with one psum of (values, written-mask)
    — no collective rides inside the scan.  nC must be a multiple of the
    mesh size (update_lowmem pads with empty chunks).
    """
    T = poses.shape[0]
    h8, w8 = disps.shape[-2:]
    ht, wd = disps_up.shape[-2:]
    coords0 = coords_grid(h8, w8)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("ck"),) * 8,
        out_specs=(P("ck"), P("ck"), P("ck"), P(), P(), P(), P()),
        check_vma=False,
    )
    def run(nets_ck, target_ck, ii_ck, jj_ck, cams_ck, kk_ck, frame_ck,
            emask_ck):
        def body(carry, xs):
            dvals, dmask, upvals = carry
            frame_ids = xs[4]
            nets, target, weight, eta0, upmask0 = _lowmem_chunk_step(
                apply_fn, params, poses, disps, intrinsics, fmaps, inps,
                coords0, S, dtype, xs,
            )
            dvals = dvals.at[frame_ids].set(eta0.astype(jnp.float32))
            dmask = dmask.at[frame_ids].set(1.0)
            if upsample:
                d = jnp.clip(frame_ids, 0, T - 1)
                up = cvx_upsample_fn(
                    disps[d][..., None], upmask0.astype(jnp.float32)
                )[..., 0]
                upvals = upvals.at[frame_ids].set(up)
            return (dvals, dmask, upvals), (nets, target, weight)

        up0 = jnp.zeros((T + 1, ht, wd) if upsample else (1, 1, 1))
        init = (jnp.zeros((T + 1, h8, w8)), jnp.zeros(T + 1), up0)
        (dvals, dmask, upvals), (nets, target, weight) = jax.lax.scan(
            body, init,
            (ii_ck, jj_ck, cams_ck, kk_ck, frame_ck, emask_ck,
             nets_ck, target_ck),
        )
        dvals = jax.lax.psum(dvals, "ck")
        dmask = jax.lax.psum(dmask, "ck")
        upvals = jax.lax.psum(upvals, "ck")
        return nets, target, weight, dvals, dmask, upvals, dmask

    nets, target, weight, dvals, dmask, upvals, _ = run(
        nets_ck, target_ck, ii_ck, jj_ck, cams_ck, kk_ck, frame_ck, emask_ck
    )
    written = dmask[:T] > 0
    damping_out = jnp.where(written[:, None, None], dvals[:T], damping)
    if upsample:
        disps_up = jnp.where(written[:, None, None], upvals[:T],
                             disps_up[:T])
        disps_up = jnp.concatenate(
            [disps_up, jnp.zeros((1, ht, wd))], axis=0
        )
    return nets, target, weight, damping_out, disps_up


# late import target for _lowmem_refresh's optional upsampling
from ..models.update import cvx_upsample as cvx_upsample_fn  # noqa: E402


@partial(
    jax.jit,
    static_argnames=("apply_fn", "rounds", "ba_iters", "dtype", "use_pallas",
                     "motion_only", "with_cull"),
)
def _fused_rounds(
    apply_fn,
    params,
    poses_win,
    disps_win,
    disps_sens_win,
    damping_win,
    intr,
    fmap1_e,
    fmap2_e,
    nets_e,
    inps_e,
    target_a,
    ii_a,
    jj_a,
    kk_a,
    active_mask,
    has_edge,
    ii_all,
    jj_all,
    target_inac,
    weight_inac,
    free_mask,
    bucket_edges,
    bucket_mask,
    cull_ij,
    rounds,
    ba_iters,
    lm,
    ep,
    damping_eps,
    min_depth,
    beta,
    dtype=jnp.float32,
    use_pallas=False,
    motion_only=False,
    with_cull=False,
):
    """K rounds of (update op + dense BA) as ONE XLA program.

    This is the latency-critical redesign vs the reference, which dispatches
    dozens of kernels + host syncs per round (factor_graph.py:198-250):
    on TPU the whole per-keyframe loop runs in-graph, so the host pays one
    dispatch per keyframe instead of ~2 per round.

    All arrays are window-local ([MW] frames); active edges carry the
    update-op state, inactive edges join only the BA with frozen
    target/weight (reference :224-231).
    """
    MW = poses_win.shape[0]
    h8, w8 = disps_win.shape[-2:]
    coords0 = coords_grid(h8, w8)
    intr_win = jnp.broadcast_to(intr, (MW, 4))

    # all-pairs correlation volume pyramid, built ONCE per keyframe on the
    # MXU; every round samples it with the configured lookup (Pallas P-major
    # kernel on TPU — the per-round cost drops from 21.4 to 3.7 ms at EuRoC
    # scale on v5e; see _CORR_IMPL above for the alternatives).
    E = fmap1_e.shape[0]
    impl = _corr_impl()
    if _USE_CORR_WINDOWS:
        vol = corr_volume_flat(fmap1_e, fmap2_e, dtype=dtype)
        pyr = build_pyramid_flat(vol, num_levels=4)
        padded, wmeta = pad_pyramid_flat(pyr)

        coords_init, _ = projective_transform(
            poses_win[None], disps_win[None], intr_win[None], ii_a, jj_a
        )
        cflat0 = coords_init[0].reshape(E, h8 * w8, 2)
        wbases = window_bases(cflat0, wmeta)
        wins = extract_windows(padded, wmeta, wbases)
    elif impl == "pallas":
        # fused Pallas window-cache build once per keyframe (the
        # reprojection moves < 1 px/round once BA converges); the pyramid
        # itself never touches HBM — the drift-guarded lax.cond REBUILDS it
        # on demand for the full lookup, so results are exact regardless
        # while the common path writes only the ~0.3 GB window tile
        interp = jax.devices()[0].platform == "cpu"
        coords_init, _ = projective_transform(
            poses_win[None], disps_win[None], intr_win[None], ii_a, jj_a
        )
        cflat0 = coords_init[0].reshape(E, h8 * w8, 2)
        pwins, pbases, pmeta, _ = corr_build_windows_light_pallas(
            fmap1_e, fmap2_e, cflat0, dtype=dtype, interpret=interp
        )

        def _full_lookup(c):
            levels, _, _ = corr_build_pmajor_pallas(
                fmap1_e, fmap2_e, dtype=dtype, interpret=interp
            )
            return corr_lookup_blocked_pallas(
                levels, pmeta, c, interpret=interp
            )

        def lookup(cflat):
            return jax.lax.cond(
                window_drift_ok_pallas(pbases, pmeta, cflat),
                lambda c: corr_lookup_windows_pallas(
                    pwins, pbases, pmeta, c, interpret=interp
                ),
                _full_lookup,
                cflat,
            )
    else:
        lookup = _build_corr_lookup(fmap1_e, fmap2_e, dtype)

    amask = active_mask[:, None, None, None].astype(jnp.float32)

    def round_body(_, st):
        poses, disps, damping, nets, target_a, _, _ = st

        coords1, _ = projective_transform(
            poses[None], disps[None], intr_win[None], ii_a, jj_a
        )
        coords1 = coords1[0]
        motn = jnp.clip(
            jnp.concatenate([coords1 - coords0, target_a - coords1], axis=-1),
            -64.0, 64.0,
        )
        cflat = coords1.reshape(E, h8 * w8, 2)
        if _USE_CORR_WINDOWS:
            corr = jax.lax.cond(
                window_drift_ok(cflat, wmeta, wbases),
                lambda c: corr_lookup_windows(wins, wmeta, wbases, c),
                lambda c: corr_lookup_pyramid_flat(pyr, c),
                cflat,
            )
        else:
            corr = lookup(cflat)
        corr = corr.reshape(E, h8, w8, -1)

        # active_mask excludes padded edges from GraphAgg's per-frame mean
        nets, delta, weight, eta, upmask = apply_fn(
            params, nets[None], inps_e[None], corr[None].astype(dtype),
            motn[None].astype(dtype), kk_a, MW,
            active_mask.astype(jnp.float32),
        )
        nets = nets[0]
        target_a = coords1 + delta[0].astype(jnp.float32)
        weight_a = weight[0].astype(jnp.float32) * amask

        damping = jnp.where(has_edge[:, None, None], eta[0].astype(jnp.float32), damping)
        eta_ba = 0.2 * damping + damping_eps

        target_all = jnp.concatenate([target_inac, target_a], axis=0)
        weight_all = jnp.concatenate([weight_inac, weight_a], axis=0)

        poses, disps = ba_iterations(
            poses, disps, intr, disps_sens_win, target_all, weight_all, eta_ba,
            ii_all, jj_all, free_mask, bucket_edges, bucket_mask,
            iterations=ba_iters, lm=lm, ep=ep, min_depth=min_depth,
            use_pallas=use_pallas, motion_only=motion_only,
        )
        disps = jnp.maximum(disps, 0.001)
        return poses, disps, damping, nets, target_a, weight_a, upmask[0]

    weight0 = jnp.zeros_like(target_a)
    upmask0 = jnp.zeros((MW, h8, w8, 8 * 8 * 9), dtype)
    poses, disps, damping, nets, target_a, weight_a, upmask = jax.lax.fori_loop(
        0, rounds, round_body,
        (poses_win, disps_win, damping_win, nets_e, target_a, weight0, upmask0),
    )
    # the keyframe-culling distance rides the SAME program: the frontend's
    # post-update d(t1-3, t1-2) check (reference droid_frontend.py:56-64)
    # used to be its own dispatch + host sync per keyframe — here the
    # bidirectional mean is computed on the final state in-graph and the
    # host reads it off this program's output (one sync per keyframe
    # total).  Static-gated: the post-loop tail serializes ~0.5 ms after
    # the rounds, so only the frontend's culling call pays it.
    if with_cull:
        d2 = frame_distance(
            poses, disps, intr, cull_ij, cull_ij[::-1],
            beta=beta, min_depth=min_depth,
        )
        d_cull = 0.5 * (d2[0] + d2[1])
    else:
        d_cull = jnp.float32(0.0)
    # the LAST round's per-frame upsampling mask rides out of the fused loop
    # so `--upsample` keeps the one-dispatch path (reference upsamples inside
    # each update, factor_graph.py:246-248; the final mask is what persists)
    return poses, disps, damping, nets, target_a, weight_a, upmask, d_cull


class FactorGraph:
    def __init__(self, video, update_apply, params, max_factors=-1, upsample=False,
                 dtype=jnp.float32):
        self.video = video
        self.update_apply = update_apply  # UpdateModule apply(params, ...)
        self.params = params
        self.max_factors = max_factors
        self.upsample = upsample
        self.dtype = dtype
        cfg = video.cfg
        self.cfg = cfg

        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)

        h8, w8 = video.h8, video.w8
        self.net = jnp.zeros((0, h8, w8, 128), dtype)
        self.target = jnp.zeros((0, h8, w8, 2), jnp.float32)
        self.weight = jnp.zeros((0, h8, w8, 2), jnp.float32)

        # inactive / bad stores (reference :36-42)
        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.target_inac = jnp.zeros((0, h8, w8, 2), jnp.float32)
        self.weight_inac = jnp.zeros((0, h8, w8, 2), jnp.float32)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)

    # ------------------------------------------------------------- edge mgmt

    def _dedup(self, ii, jj):
        """Drop edges already present (active or inactive) (reference :44-55)."""
        from ..native import dedup_edges

        ex_i = np.concatenate([self.ii, self.ii_inac])
        ex_j = np.concatenate([self.jj, self.jj_inac])
        keep = dedup_edges(ii, jj, ex_i, ex_j)
        return ii[keep], jj[keep]

    def add_factors(self, ii, jj, remove=False):
        """Add edges (reference :86-134)."""
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        ii, jj = self._dedup(ii, jj)
        if len(ii) == 0:
            return

        # cap total factor count, evicting the oldest (reference :103-107)
        if (
            self.max_factors > 0
            and len(self.ii) + len(ii) > self.max_factors
            and len(self.ii) > 0
            and remove
        ):
            ix = np.argsort(self.age)[::-1]  # oldest = highest age
            n_evict = len(self.ii) + len(ii) - self.max_factors
            mask = np.zeros(len(self.ii), bool)
            mask[ix[:n_evict]] = True
            self.rm_factors(mask, store=True)

        net = self.video.nets[jnp.asarray(ii)]
        target, _ = self.video.reproject(ii, jj)
        target = target[0]

        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros(len(ii), np.int64)])
        self.net = jnp.concatenate([self.net, net.astype(self.net.dtype)], 0)
        self.target = jnp.concatenate([self.target, target], 0)
        self.weight = jnp.concatenate([self.weight, jnp.zeros_like(target)], 0)

    def rm_factors(self, mask, store=False):
        """Remove edges; optionally store as inactive (reference :137-161)."""
        mask = np.asarray(mask, bool)
        if store and mask.any():
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[mask]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[mask]])
            keep_d = jnp.asarray(mask)
            self.target_inac = jnp.concatenate(
                [self.target_inac, self.target[keep_d]], 0
            )
            self.weight_inac = jnp.concatenate(
                [self.weight_inac, self.weight[keep_d]], 0
            )
        keep = ~mask
        self.ii, self.jj, self.age = self.ii[keep], self.jj[keep], self.age[keep]
        kd = jnp.asarray(keep)
        self.net = self.net[kd]
        self.target = self.target[kd]
        self.weight = self.weight[kd]

    def rm_keyframe(self, ix):
        """Drop keyframe ix: shift buffers, reindex edges (reference :165-194)."""
        self.video.remove_keyframe(ix)

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac = np.where(self.ii_inac >= ix, self.ii_inac - 1, self.ii_inac)
        self.jj_inac = np.where(self.jj_inac >= ix, self.jj_inac - 1, self.jj_inac)
        if m.any():
            keep = jnp.asarray(~m)
            self.ii_inac = self.ii_inac[~m]
            self.jj_inac = self.jj_inac[~m]
            self.target_inac = self.target_inac[keep]
            self.weight_inac = self.weight_inac[keep]

        m = (self.ii == ix) | (self.jj == ix)
        self.ii = np.where(self.ii >= ix, self.ii - 1, self.ii)
        self.jj = np.where(self.jj >= ix, self.jj - 1, self.jj)
        self.rm_factors(m, store=False)

    def filter_edges(self):
        """Cull low-confidence long-range edges (reference :71-78)."""
        conf = np.asarray(jnp.mean(self.weight, axis=(1, 2, 3)))
        mask = (np.abs(self.ii - self.jj) > 2) & (conf < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, self.ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, self.jj[mask]])
        self.rm_factors(mask, store=False)

    def clear_edges(self):
        self.rm_factors(np.ones(len(self.ii), bool))
        self.net = jnp.zeros((0,) + self.net.shape[1:], self.net.dtype)

    # ----------------------------------------------------------------- update

    def _padded_edges(self):
        """Pad edge arrays to the bucketed count with (0,0) zero-weight edges."""
        n = len(self.ii)
        n_pad = _round_up(max(n, 1), self.cfg.edge_bucket)
        ii = np.zeros(n_pad, np.int32)
        jj = np.zeros(n_pad, np.int32)
        ii[:n] = self.ii
        jj[:n] = self.jj
        return n, n_pad, ii, jj

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False, EP=1e-7,
               motion_only=False):
        """One GRU + DBA round (reference factor_graph.py:198-250)."""
        if len(self.ii) == 0:
            return
        video = self.video
        n, n_pad, ii_p, jj_p = self._padded_edges()

        # aggregation window [m0, t1) bucketed
        t1_eff = int(max(self.ii.max(), self.jj.max())) + 1
        m0 = int(self.ii.min())
        MW = _round_up(t1_eff - m0, self.cfg.window_bucket)
        m0 = max(0, t1_eff - MW)
        kk = np.clip(ii_p - m0, 0, MW - 1).astype(np.int32)
        cams = ((ii_p == jj_p) & video.stereo).astype(np.int32)
        emask = (np.arange(n_pad) < n).astype(np.float32)

        # pad edge state
        h8, w8 = video.h8, video.w8
        pad = n_pad - n
        net_e = jnp.concatenate(
            [self.net, jnp.zeros((pad, h8, w8, 128), self.net.dtype)], 0
        )
        inp_e = video.inps[jnp.asarray(ii_p)]
        target_e = jnp.concatenate(
            [self.target, jnp.zeros((pad, h8, w8, 2), jnp.float32)], 0
        )

        net, target, weight, eta, upmask, _ = _update_op_step(
            self.update_apply, self.params,
            video.poses, video.disps, video.intrinsics, video.fmaps,
            net_e, inp_e, target_e,
            jnp.asarray(ii_p), jnp.asarray(jj_p), jnp.asarray(cams),
            jnp.asarray(kk), jnp.asarray(emask), MW, dtype=self.dtype,
        )

        self.net = net[:n]
        self.target = target[:n]
        self.weight = weight[:n]

        # persist damping for frames that have outgoing edges (reference :221)
        has_edge = np.zeros(MW, bool)
        has_edge[self.ii - m0] = True
        dwin = video.damping[m0 : m0 + MW]
        dwin = jnp.where(jnp.asarray(has_edge)[:, None, None], eta, dwin)
        video.damping = video.damping.at[m0 : m0 + MW].set(dwin)

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        if t1 is None:
            t1 = int(max(self.ii.max(), self.jj.max())) + 1

        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            ii_ba = np.concatenate([self.ii_inac[m], self.ii])
            jj_ba = np.concatenate([self.jj_inac[m], self.jj])
            target_ba = jnp.concatenate([self.target_inac[jnp.asarray(m)], self.target], 0)
            weight_ba = jnp.concatenate([self.weight_inac[jnp.asarray(m)], self.weight], 0)
        else:
            ii_ba, jj_ba = self.ii, self.jj
            target_ba, weight_ba = self.target, self.weight

        video.ba(
            target_ba, weight_ba, None, ii_ba, jj_ba, t0, t1,
            iterations=itrs, lm=self.cfg.frontend_lm, ep=self.cfg.frontend_ep,
            motion_only=motion_only,
        )

        if self.upsample:
            ux = np.unique(self.ii)
            sel = jnp.asarray(ux - m0)
            video.upsample(jnp.asarray(ux), upmask[sel].astype(jnp.float32))

        self.age += 1

    def update_fused(self, rounds, t0=None, t1=None, itrs=2, use_inactive=True,
                     cull_pair=None, motion_only=False):
        """K rounds of (update op + DBA) in one device program.

        Semantics match `rounds` successive update() calls (reference
        droid_frontend.py:52-53 loops); the host pays a single dispatch.
        When cfg.upsample is set, the final round's upmask upsamples the
        source frames' disparities (reference factor_graph.py:246-248).

        cull_pair: optional (i, j) global frame pair; the bidirectional
        flow distance between them on the FINAL state is computed inside
        the same program and returned as a device scalar — the frontend's
        keyframe-culling decision reads it without a second dispatch.
        """
        if len(self.ii) == 0 or rounds == 0:
            return None
        video = self.video
        cfg = self.cfg
        n, n_pad, ii_p, jj_p = self._padded_edges()

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        if t1 is None:
            t1 = int(max(self.ii.max(), self.jj.max())) + 1

        h8, w8 = video.h8, video.w8
        if use_inactive and len(self.ii_inac):
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            ii_i = self.ii_inac[m]
            jj_i = self.jj_inac[m]
            tgt_i = self.target_inac[jnp.asarray(m)]
            wgt_i = self.weight_inac[jnp.asarray(m)]
        else:
            ii_i = np.zeros(0, np.int64)
            jj_i = np.zeros(0, np.int64)
            tgt_i = jnp.zeros((0, h8, w8, 2), jnp.float32)
            wgt_i = jnp.zeros((0, h8, w8, 2), jnp.float32)
        ni = len(ii_i)
        ni_pad = _round_up(ni, self.cfg.edge_bucket) if ni else 0
        ii_ip = np.zeros(ni_pad, np.int32)
        jj_ip = np.zeros(ni_pad, np.int32)
        ii_ip[:ni] = ii_i
        jj_ip[:ni] = jj_i
        pad_i = ni_pad - ni
        tgt_i = jnp.concatenate([tgt_i, jnp.zeros((pad_i, h8, w8, 2))], 0)
        wgt_i = jnp.concatenate([wgt_i, jnp.zeros((pad_i, h8, w8, 2))], 0)

        # window covering every referenced frame + the free range [t0, t1)
        lows = [int(self.ii.min()), int(self.jj.min()), t0]
        if ni:
            lows += [int(ii_i.min()), int(jj_i.min())]
        lo = min(lows)
        MW = _round_up(t1 - lo, cfg.window_bucket)
        m0 = max(0, t1 - MW)
        if m0 == 0:
            MW = _round_up(t1, cfg.window_bucket)

        ii_al = ii_p - m0
        jj_al = jj_p - m0
        ii_il = ii_ip - m0
        jj_il = jj_ip - m0
        # padded slots (and any inactive pads) anchor at local 0
        ii_al[n:] = 0
        jj_al[n:] = 0
        ii_il[ni:] = 0
        jj_il[ni:] = 0

        ii_all = np.concatenate([ii_il, ii_al]).astype(np.int32)
        jj_all = np.concatenate([jj_il, jj_al]).astype(np.int32)
        from ..native import bucket_tables

        be, bm = bucket_tables(ii_all, MW)

        free = np.zeros(MW, bool)
        free[t0 - m0 : t1 - m0] = True
        kk_a = np.clip(ii_al, 0, MW - 1).astype(np.int32)
        active_mask = np.arange(n_pad) < n
        has_edge = np.zeros(MW, bool)
        has_edge[self.ii - m0] = True

        cams = ((ii_p == jj_p) & video.stereo).astype(np.int32)
        pad = n_pad - n
        # one jitted gather for every per-edge/window input (each separate
        # device op costs a dispatch round-trip on the host side)
        (fmap1_e, fmap2_e, nets_e, inps_e, target_a,
         poses_w, disps_w, dsens_w, damping_w) = _gather_window(
            video.fmaps, video.inps, video.poses, video.disps,
            video.disps_sens, video.damping, self.net, self.target,
            jnp.asarray(ii_p), jnp.asarray(jj_p), jnp.asarray(cams),
            m0, pad=pad, MW=MW,
        )

        if cull_pair is not None:
            cull_ij = np.asarray(
                [cull_pair[0] - m0, cull_pair[1] - m0], np.int32
            )
        else:
            cull_ij = np.zeros(2, np.int32)

        sl = slice(m0, m0 + MW)
        from ..utils.timing import section

        with section("update_fused.device"):
            (poses, disps, damping, nets, target_out, weight_out, upmask,
             d_cull) = _fused_rounds(
                self.update_apply, self.params,
                poses_w, disps_w, dsens_w, damping_w, video.intrinsics[0],
                fmap1_e, fmap2_e, nets_e, inps_e, target_a,
                jnp.asarray(ii_al.astype(np.int32)), jnp.asarray(jj_al.astype(np.int32)),
                jnp.asarray(kk_a), jnp.asarray(active_mask), jnp.asarray(has_edge),
                jnp.asarray(ii_all), jnp.asarray(jj_all), tgt_i, wgt_i,
                jnp.asarray(free), jnp.asarray(be), jnp.asarray(bm),
                jnp.asarray(cull_ij),
                rounds=rounds, ba_iters=itrs,
                lm=cfg.frontend_lm, ep=cfg.frontend_ep,
                damping_eps=cfg.damping_eps, min_depth=cfg.min_depth,
                beta=cfg.beta, dtype=self.dtype,
                use_pallas=resolve_pallas_ba(cfg), motion_only=motion_only,
                with_cull=cull_pair is not None,
            )

        if _os.environ.get("DROID_TIMING"):
            with section("update_fused.sync"):
                np.asarray(jnp.ravel(poses)[:1])  # attribute device time
        video.poses, video.disps, video.damping = _scatter_window(
            video.poses, video.disps, video.damping, poses, disps, damping, m0
        )
        self.net = nets[:n]
        self.target = target_out[:n]
        self.weight = weight_out[:n]
        if self.upsample:
            ux = np.unique(self.ii)
            video.upsample(
                jnp.asarray(ux), upmask[jnp.asarray(ux - m0)].astype(jnp.float32)
            )
        self.age += rounds
        return d_cull if cull_pair is not None else None

    def probe_quality(self):
        """Run the update op once (no BA) and return per-edge summed
        confidence weights — the multisession match-quality signal
        (reference s_droid_frontend.py:116-146).  Updates edge hidden
        states only, as the reference does."""
        if len(self.ii) == 0:
            return np.zeros(0)
        video = self.video
        n, n_pad, ii_p, jj_p = self._padded_edges()
        t1_eff = int(max(self.ii.max(), self.jj.max())) + 1
        m0 = int(self.ii.min())
        MW = _round_up(t1_eff - m0, self.cfg.window_bucket)
        m0 = max(0, t1_eff - MW)
        kk = np.clip(ii_p - m0, 0, MW - 1).astype(np.int32)
        cams = ((ii_p == jj_p) & video.stereo).astype(np.int32)
        emask = (np.arange(n_pad) < n).astype(np.float32)

        h8, w8 = video.h8, video.w8
        pad = n_pad - n
        net_e = jnp.concatenate(
            [self.net, jnp.zeros((pad, h8, w8, 128), self.net.dtype)], 0
        )
        inp_e = video.inps[jnp.asarray(ii_p)]
        target_e = jnp.concatenate(
            [self.target, jnp.zeros((pad, h8, w8, 2), jnp.float32)], 0
        )
        net, _, weight, _, _, _ = _update_op_step(
            self.update_apply, self.params,
            video.poses, video.disps, video.intrinsics, video.fmaps,
            net_e, inp_e, target_e,
            jnp.asarray(ii_p), jnp.asarray(jj_p), jnp.asarray(cams),
            jnp.asarray(kk), jnp.asarray(emask), MW, dtype=self.dtype,
        )
        self.net = net[:n]
        return np.asarray(jnp.sum(weight[:n], axis=(1, 2, 3)))

    def _resolved_refresh_shards(self, nC):
        """cfg.refresh_shards with -1 = auto: shard the backend's chunked
        edge refresh over every local device when there are chunks to
        split."""
        s = getattr(self.cfg, "refresh_shards", -1)
        if s in (0, 1):
            return 1
        n = jax.local_device_count() if s == -1 else s
        return n if (n > 1 and nC >= 2) else 1

    def _refresh_mesh(self, n):
        if getattr(self, "_ck_mesh", None) is None or self._ck_mesh.size != n:
            from ..parallel import make_mesh

            self._ck_mesh = make_mesh((n,), ("ck",), devices=jax.devices()[:n])
        return self._ck_mesh

    def update_lowmem(self, steps=8, itrs=2, EP=1e-7):
        """Global BA over all edges, chunked over source frames
        (reference factor_graph.py:253-300).

        TPU redesign: the per-chunk host loop becomes one scanned device
        program per refresh (``_lowmem_refresh``) — the chunk tables are
        built once per call, and each of the ``steps`` refreshes costs a
        single dispatch with all edge state resident on-device.
        """
        video = self.video
        t = video.counter
        s = 8  # source-frame chunk (reference :270)
        nE = len(self.ii)
        if nE == 0:
            return
        h8, w8 = video.h8, video.w8

        # ---- host chunk tables, once per call (graph is fixed across steps)
        # edges sorted by source frame; every s-frame band is one chunk
        # (covers the full ii range — the reference iterates source frames)
        order = np.argsort(self.ii, kind="stable")
        ii_s = self.ii[order]
        i_max = int(ii_s.max())
        nC = i_max // s + 1
        # shard the chunk axis over local devices (SURVEY.md §5 "sharded
        # fused correlation lookup"); empty pad chunks keep shapes static
        ndev = self._resolved_refresh_shards(nC)
        nC_pad = _round_up(nC, ndev) if ndev > 1 else nC
        counts = np.zeros(nC, np.int64)
        for i0 in range(0, i_max + 1, s):
            counts[i0 // s] = np.count_nonzero((ii_s >= i0) & (ii_s < i0 + s))
        EB = _round_up(max(int(counts.max()), 1), self.cfg.edge_bucket)

        ii_ck = np.zeros((nC_pad, EB), np.int32)
        jj_ck = np.zeros((nC_pad, EB), np.int32)
        emask_ck = np.zeros((nC_pad, EB), np.float32)
        pos_ck = np.zeros((nC_pad, EB), np.int64)  # edge index (sorted order)
        frame_ck = np.full((nC_pad, s), t, np.int32)  # sentinel = t (no edges)
        kk_ck = np.zeros((nC_pad, EB), np.int32)
        ofs = 0
        for c in range(nC):
            n = int(counts[c])
            sel = order[ofs : ofs + n]
            ii_ck[c, :n] = self.ii[sel]
            jj_ck[c, :n] = self.jj[sel]
            emask_ck[c, :n] = 1.0
            pos_ck[c, :n] = sel
            kk_ck[c, :n] = self.ii[sel] - c * s
            has = np.unique(self.ii[sel]) - c * s
            frame_ck[c, has] = c * s + has
            ofs += n
        cams_ck = ((ii_ck == jj_ck) & video.stereo).astype(np.int32)
        flat_idx = pos_ck.reshape(-1)
        slots = np.nonzero(emask_ck.reshape(-1) > 0)[0]
        take_back_np = np.empty(nE, np.int64)
        take_back_np[flat_idx[slots]] = slots
        flat_src = jnp.asarray(flat_idx)                    # chunk slot -> edge
        take_back = jnp.asarray(take_back_np)               # edge -> flat slot

        ii_ck = jnp.asarray(ii_ck)
        jj_ck = jnp.asarray(jj_ck)
        cams_ck = jnp.asarray(cams_ck)
        kk_ck = jnp.asarray(kk_ck)
        frame_ck = jnp.asarray(frame_ck)
        emask_ck = jnp.asarray(emask_ck)

        dummy_up = jnp.zeros((1, 1, 1))
        for step in range(steps):
            nets_ck = self.net[flat_src].reshape(nC_pad, EB, h8, w8, -1)
            target_ck = self.target[flat_src].reshape(nC_pad, EB, h8, w8, 2)
            if self.upsample:
                if video.disps_up is None:
                    video.disps_up = jnp.zeros(
                        (video.cfg.buffer, video.ht, video.wd), jnp.float32
                    )
                # sentinel frame id t scatters into the extra trailing row
                ups = jnp.concatenate(
                    [video.disps_up[:t], jnp.zeros((1, video.ht, video.wd))], 0
                )
            else:
                ups = dummy_up

            if ndev > 1:
                nets, target, weight, damping, ups = _lowmem_refresh_sharded(
                    self._refresh_mesh(ndev), self.update_apply, self.params,
                    video.poses[:t], video.disps[:t], ups,
                    video.intrinsics[:t], video.fmaps[:t], video.inps[:t],
                    nets_ck, target_ck, ii_ck, jj_ck, cams_ck, kk_ck,
                    frame_ck, emask_ck, video.damping[:t],
                    S=s, dtype=self.dtype, upsample=self.upsample,
                )
            else:
                nets, target, weight, damping, ups = _lowmem_refresh(
                    self.update_apply, self.params,
                    video.poses[:t], video.disps[:t], ups,
                    video.intrinsics[:t], video.fmaps[:t], video.inps[:t],
                    nets_ck, target_ck, ii_ck, jj_ck, cams_ck, kk_ck,
                    frame_ck, emask_ck, video.damping[:t],
                    S=s, dtype=self.dtype, upsample=self.upsample,
                )
            flat = lambda x: x.reshape((nC_pad * EB,) + x.shape[2:])
            self.net = flat(nets)[take_back]
            self.target = flat(target)[take_back]
            self.weight = flat(weight)[take_back]
            video.damping = video.damping.at[:t].set(damping)
            if self.upsample:
                video.disps_up = video.disps_up.at[:t].set(ups[:-1])

            # one dense BA over the whole window (reference :297)
            video.ba(
                self.target, self.weight, None, self.ii, self.jj, 1, t,
                iterations=itrs, lm=self.cfg.backend_lm, ep=self.cfg.backend_ep,
            )
            video.dirty[:t] = True

    # ------------------------------------------------------- edge proposals

    def add_neighborhood_factors(self, t0, t1, r=3):
        """Edges between frames within radius r (reference :302-312)."""
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1), indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        c = 1 if self.video.stereo else 0
        keep = (np.abs(ii - jj) > c) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False, dmat=None):
        """Distance-based edge selection with NMS (reference :315-379).

        dmat: optional precomputed [len(ix), len(jx)] distance matrix (the
        frontend's async prefetch); None computes it synchronously."""
        t = self.video.counter
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            return
        if dmat is not None and dmat.shape == (len(ix), len(jx)):
            d = np.asarray(dmat)
        else:
            from ..utils.timing import count_sync

            count_sync()  # blocking edge-selection sync (no prefetch hit)
            d = self.video.distance_matrix(t0, t1, t, beta=beta)

        # native greedy NMS selection when the library is available
        from .. import native

        if native.have_native():
            ex_i = np.concatenate([self.ii, self.ii_bad, self.ii_inac]).astype(np.int32)
            ex_j = np.concatenate([self.jj, self.jj_bad, self.jj_inac]).astype(np.int32)
            sel = native.proximity_select(
                d, t0, t1, t, rad, nms, thresh, self.max_factors,
                ex_i, ex_j, self.video.stereo,
            )
            if sel is not None:
                si, sj = sel
                if len(si):
                    self.add_factors(si, sj, remove)
                return

        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        d = d.reshape(-1).astype(np.float64)
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)

        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf

        def suppress(i, j):
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= max(min(abs(i - j) - 2, nms), 0):
                        i1, j1 = i + di, j + dj
                        if (t0 <= i1 < t) and (t1 <= j1 < t):
                            d[(i1 - t0) * (t - t1) + (j1 - t1)] = np.inf

        # suppress around existing edges (reference :330-340)
        ii1 = np.concatenate([self.ii, self.ii_bad, self.ii_inac])
        jj1 = np.concatenate([self.jj, self.jj_bad, self.jj_inac])
        for i, j in zip(ii1.tolist(), jj1.tolist()):
            suppress(i, j)

        es = []
        for i in range(t0, t):
            if self.video.stereo:
                es.append((i, i))
                d[(i - t0) * (t - t1) + (i - t1)] = np.inf
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                if t1 <= j < t:
                    d[(i - t0) * (t - t1) + (j - t1)] = np.inf

        # greedy thresholded selection (reference :354-376)
        for k in np.argsort(d):
            if d[k] > thresh:
                break
            if self.max_factors > 0 and len(es) > self.max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            es.append((i, j))
            es.append((j, i))
            suppress(i, j)

        if es:
            es = np.asarray(es, np.int64)
            self.add_factors(es[:, 0], es[:, 1], remove)
