"""Fused correlation-pyramid lookup as a Pallas TPU kernel.

TPU-native replacement for the reference's CUDA radius-3 bilinear sampler
(reference src/correlation_kernels.cu:19-124, altcorr_kernel.cu:27-149) for
the pixels-last ("P-major") volume layout of ops/corr.py.

Why a kernel: the lookup is pure gather + blend — arithmetically free,
bandwidth-bound.  The XLA formulations either turn the gather into one-hot
matmuls that read every volume row per pixel (flat path, 21 ms/round at
EuRoC scale on v5e) or materialize every stage of the per-lane select tree
in HBM (P-major path, 17 ms/round).  Here each grid step DMAs its pixel
block's volume slab into VMEM ONCE and runs the whole select tree + both
bilinear blends on-chip, so HBM traffic is exactly one read of the pyramid
(~1.5 GB -> ~2 ms/round at EuRoC scale, ~10x the XLA variants).

Layout: pixels ride the LANE dimension throughout ([Hp, Wp, PB] slabs);
per-pixel dynamic row/col selection is a binary tree of static slices +
`where` with the per-lane window start broadcast across lanes — the same
formulation as ops.corr._tree_take8, but with every intermediate in VMEM.

Semantics match corr_lookup_pyramid_flat exactly (channel a*(2r+1)+b with
a = x tap; zero outside the image via the 8-px zero border the P-major
build pads; level-major concat; bf16 blends).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PPAD = 8  # zero border of build_pyramid_pmajor (ops/corr.py)


def _pick_pb(P, block_p):
    """Largest pixel-block size <= block_p that divides P and is a multiple
    of 128 (Mosaic requires lane-dim blocks divisible by 128 or equal to
    the full dimension).  Callers pad P to a 128-multiple first."""
    assert P % 128 == 0, P
    pb = (min(block_p, P) // 128) * 128
    while P % pb:
        pb -= 128
    return pb


def _pad_p(x, P_pad, axis):
    """Zero-pad the pixel axis up to P_pad."""
    P = x.shape[axis]
    if P == P_pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, P_pad - P)
    return jnp.pad(x, widths)


def _round_up128(x):
    return ((x + 127) // 128) * 128


def _tree_take8(x, s, axis, R):
    """x[..., s:s+8, ...] along `axis` for per-lane s in [0, R] (see
    ops.corr._tree_take8; static slices + where chain, VMEM-resident here).
    """
    while R > 0:
        b = (R + 1) // 2
        Rp = max(b - 1, R - b)
        n = Rp + 8
        left = jax.lax.slice_in_dim(x, 0, n, axis=axis)
        right = jax.lax.slice_in_dim(x, b, b + n, axis=axis)
        cond = s >= b
        x = jnp.where(cond, right, left)
        s = s - b * cond.astype(s.dtype)
        R = Rp
    return x


def _lookup_kernel(meta, radius, ct_ref, *refs):
    """Grid step (e, pb): full pyramid lookup for one pixel block.

    ct_ref: [1, 2, PB] level-0 coords (x, y); refs = L volume refs
    ([1, Hp_l, Wp_l, PB] each) + out_ref [1, L*(2r+1)**2, PB].
    """
    out_ref = refs[-1]
    vrefs = refs[:-1]
    rd = 2 * radius + 1
    for lvl, (vref, (H2, W2)) in enumerate(zip(vrefs, meta)):
        Hp, Wp = H2 + 2 * _PPAD, W2 + 2 * _PPAD
        scale = 1.0 / (2.0 ** lvl)
        x0 = ct_ref[0, 0:1, :] * scale  # [1, PB]
        y0 = ct_ref[0, 1:2, :] * scale
        xf = jnp.floor(x0)
        yf = jnp.floor(y0)
        v = vref[0]  # [Hp, Wp, PB]
        dy = (y0 - yf)[None].astype(v.dtype)  # [1, 1, PB]
        dx = (x0 - xf)[None].astype(v.dtype)
        sy = jnp.clip(yf.astype(jnp.int32) + (_PPAD - radius), 0, Hp - 8)[None]
        sx = jnp.clip(xf.astype(jnp.int32) + (_PPAD - radius), 0, Wp - 8)[None]
        w8 = _tree_take8(v, sy, axis=0, R=Hp - 8)              # [8, Wp, PB]
        yb = (1 - dy) * w8[:rd] + dy * w8[1 : rd + 1]          # [rd, Wp, PB]
        x8 = _tree_take8(yb, sx, axis=1, R=Wp - 8)             # [rd, 8, PB]
        xb = (1 - dx) * x8[:, :rd] + dx * x8[:, 1 : rd + 1]    # [b, a, PB]
        blk = jnp.swapaxes(xb, 0, 1).reshape(rd * rd, -1)      # a*rd + b
        out_ref[0, lvl * rd * rd : (lvl + 1) * rd * rd, :] = blk


@functools.partial(
    jax.jit, static_argnames=("meta", "radius", "block_p", "interpret")
)
def corr_lookup_pmajor_pallas(padded, meta, coords, radius=3, block_p=256,
                              interpret=False):
    """Pyramid lookup on padded P-major volumes — one fused Pallas kernel.

    padded: list of L [E, Hp_l, Wp_l, P] volumes from build_pyramid_pmajor;
    meta: static tuple of (H2_l, W2_l); coords: [E, P, 2] level-0 pixels.
    Returns [E, P, L*(2r+1)**2] (level-major, channel a*(2r+1)+b), in the
    volume dtype.  Gradients are stopped (the CUDA sampler differentiates
    the volume only; inference path here).
    """
    E, P = coords.shape[:2]
    L = len(meta)
    rd = 2 * radius + 1
    Pp = _round_up128(P)
    PB = _pick_pb(Pp, block_p)
    padded = [_pad_p(v, Pp, axis=3) for v in padded]
    coords_t = _pad_p(
        jnp.swapaxes(jax.lax.stop_gradient(coords), 1, 2), Pp, axis=2
    )
    dt = padded[0].dtype

    grid = (E, Pp // PB)
    in_specs = [pl.BlockSpec((1, 2, PB), lambda e, p: (e, 0, p),
                             memory_space=pltpu.VMEM)]
    for v in padded:
        Hp, Wp = v.shape[1:3]
        in_specs.append(
            pl.BlockSpec((1, Hp, Wp, PB), lambda e, p: (e, 0, 0, p),
                         memory_space=pltpu.VMEM)
        )
    out_spec = pl.BlockSpec((1, L * rd * rd, PB), lambda e, p: (e, 0, p),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, meta, radius),
        out_shape=jax.ShapeDtypeStruct((E, L * rd * rd, Pp), dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(coords_t.astype(jnp.float32), *padded)
    return jnp.swapaxes(out, 1, 2)[:, :P]  # [E, P, L*rd*rd]


def _build_kernel(meta, out_dtype, f1_ref, f2_ref, *out_refs):
    """Grid step (e, pb): all-pairs correlation for one pixel block, pooled
    into every pyramid level, written zero-padded (border _PPAD).

    f1_ref: [1, PB, C] source features; f2_ref: [1, H, W, C] target
    features; out_refs[l]: [1, 1, Hp_l, Wp_l, PB].
    """
    C = f1_ref.shape[-1]
    H, W = f2_ref.shape[1], f2_ref.shape[2]
    PB = f1_ref.shape[1]
    f1 = f1_ref[0]                        # [PB, C]
    f2 = f2_ref[0].reshape(H * W, C)      # [HW, C]
    # one MXU matmul: volume rows for this pixel block, fp32 accumulate
    v = jax.lax.dot_general(
        f2, f1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / 16.0)
    v = v.astype(out_dtype).reshape(H, W, PB)

    for lvl, (o_ref, (H2, W2)) in enumerate(zip(out_refs, meta)):
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        o_ref[0, 0, _PPAD : _PPAD + H2, _PPAD : _PPAD + W2, :] = v
        if lvl + 1 < len(meta):
            h, w = H2 // 2, W2 // 2
            x = v[: 2 * h, : 2 * w].reshape(h, 2, w, 2, PB)
            v = (
                x[:, 0, :, 0] + x[:, 0, :, 1] + x[:, 1, :, 0] + x[:, 1, :, 1]
            ) * jnp.asarray(0.25, v.dtype)


def corr_build_pmajor_pallas(f1, f2, num_levels=4, dtype=jnp.bfloat16,
                             block_p=256, interpret=False):
    """All-pairs volume + pyramid + zero border in ONE fused Pallas kernel,
    emitted in pixel-BLOCKED P-major layout [E, nPB, Hp_l, Wp_l, PB].

    Replaces the XLA build (einsum + 3 pools + 4 pads: ~12-15 ms/keyframe at
    EuRoC scale on v5e, dominated by layout copies) with a single pass: one
    MXU matmul per pixel block, in-VMEM pooling, padded blocked writes that
    make the lookup kernel's DMAs fully contiguous.

    f1: [E, H1, W1, C] (scaled 1/4 upstream), f2: [E, H2, W2, C].
    Returns (levels, meta, PB): levels[l] = [E, nPB, Hp_l, Wp_l, PB];
    meta = ((H2_l, W2_l), ...).  Conventions identical to
    build_pyramid_pmajor (1/16 scale, fp32 accumulate, floor pooling).
    """
    E, H1, W1, C = f1.shape
    H, W = int(f2.shape[1]), int(f2.shape[2])
    P = int(H1) * int(W1)
    Pp = _round_up128(P)
    PB = _pick_pb(Pp, block_p)
    nPB = Pp // PB

    meta = []
    h, w = H, W
    for _ in range(num_levels):
        meta.append((h, w))
        h, w = h // 2, w // 2
    meta = tuple(meta)

    in_specs = [
        pl.BlockSpec((1, PB, C), lambda e, p: (e, p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, W, C), lambda e, p: (e, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = []
    out_shapes = []
    for (H2, W2) in meta:
        Hp, Wp = H2 + 2 * _PPAD, W2 + 2 * _PPAD
        out_specs.append(
            pl.BlockSpec((1, 1, Hp, Wp, PB), lambda e, p: (e, p, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((E, nPB, Hp, Wp, PB), dtype))

    levels = pl.pallas_call(
        functools.partial(_build_kernel, meta, dtype),
        out_shape=out_shapes,
        grid=(E, nPB),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(_pad_p(f1.reshape(E, P, C), Pp, axis=1), f2)
    return list(levels), meta, PB


def _lookup_blocked_kernel(meta, radius, ct_ref, *refs):
    """Grid step (e, pb): pyramid lookup for one pixel block against the
    BLOCKED padded volumes of corr_build_pmajor_pallas."""
    out_ref = refs[-1]
    vrefs = refs[:-1]
    rd = 2 * radius + 1
    for lvl, (vref, (H2, W2)) in enumerate(zip(vrefs, meta)):
        Hp, Wp = H2 + 2 * _PPAD, W2 + 2 * _PPAD
        scale = 1.0 / (2.0 ** lvl)
        x0 = ct_ref[0, 0:1, :] * scale
        y0 = ct_ref[0, 1:2, :] * scale
        xf = jnp.floor(x0)
        yf = jnp.floor(y0)
        v = vref[0, 0]  # [Hp, Wp, PB]
        dy = (y0 - yf)[None].astype(v.dtype)
        dx = (x0 - xf)[None].astype(v.dtype)
        sy = jnp.clip(yf.astype(jnp.int32) + (_PPAD - radius), 0, Hp - 8)[None]
        sx = jnp.clip(xf.astype(jnp.int32) + (_PPAD - radius), 0, Wp - 8)[None]
        w8 = _tree_take8(v, sy, axis=0, R=Hp - 8)
        yb = (1 - dy) * w8[:rd] + dy * w8[1 : rd + 1]
        x8 = _tree_take8(yb, sx, axis=1, R=Wp - 8)
        xb = (1 - dx) * x8[:, :rd] + dx * x8[:, 1 : rd + 1]
        blk = jnp.swapaxes(xb, 0, 1).reshape(rd * rd, -1)
        out_ref[0, lvl * rd * rd : (lvl + 1) * rd * rd, :] = blk


@functools.partial(jax.jit, static_argnames=("meta", "radius", "block_p", "interpret"))
def corr_lookup_blocked_pallas(levels, meta, coords, radius=3, block_p=256,
                               interpret=False):
    """Pyramid lookup against corr_build_pmajor_pallas's blocked volumes.

    levels[l]: [E, nPB, Hp_l, Wp_l, PB]; coords: [E, P, 2] level-0 pixels.
    Returns [E, P, L*(2r+1)**2].  Same semantics as corr_lookup_pmajor_pallas;
    the blocked layout makes every DMA a contiguous slab.
    """
    E, P = coords.shape[:2]
    L = len(meta)
    rd = 2 * radius + 1
    PB = levels[0].shape[-1]
    Pp = levels[0].shape[1] * PB
    coords_t = _pad_p(
        jnp.swapaxes(jax.lax.stop_gradient(coords), 1, 2), Pp, axis=2
    )
    dt = levels[0].dtype

    in_specs = [pl.BlockSpec((1, 2, PB), lambda e, p: (e, 0, p),
                             memory_space=pltpu.VMEM)]
    for v in levels:
        Hp, Wp = v.shape[2:4]
        in_specs.append(
            pl.BlockSpec((1, 1, Hp, Wp, PB), lambda e, p: (e, p, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(_lookup_blocked_kernel, meta, radius),
        out_shape=jax.ShapeDtypeStruct((E, L * rd * rd, Pp), dt),
        grid=(E, Pp // PB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L * rd * rd, PB), lambda e, p: (e, 0, p),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords_t.astype(jnp.float32), *levels)
    return jnp.swapaxes(out, 1, 2)[:, :P]


# --------------------------------------------------------------------------
# Per-keyframe window caching (the VMEM-era version of ops/corr.py's
# windowed path, which lost to extraction cost in pure XLA).
#
# The frontend runs ~6 rounds per keyframe and the lookup coords (the
# reprojection) move well under a pixel between rounds once BA converges.
# So: extract each pixel's WIN x WIN window (per level) around the FIRST
# round's coords once, and give every later round a lookup that reads only
# the windows — at EuRoC scale ~550 MB/round instead of the ~1.85 GB full
# pyramid.  A per-round drift check (window start stays in [0, WIN-8])
# lax.cond's back to the full lookup, so results are exact always: the
# 8-wide zero border means clipped window reads reproduce the full path's
# out-of-image zeros bit-for-bit (taps that would cross the border land
# entirely in zeros in both paths).
# --------------------------------------------------------------------------

import os as _os

# cached window extent (rows and cols); drift tolerance = +-(WIN-8)/2 px.
# 24 (default) tolerates +-8 px of reprojection drift between rounds; 16
# (+-4 px) reads/selects ~2x less per round but falls back to the full
# lookup more often on aggressive motion.
_WIN = int(_os.environ.get("DROID_WIN", "24"))


def _tree_take(x, s, axis, R, size):
    """x[..., s:s+size, ...] along `axis` for per-lane s in [0, R]."""
    while R > 0:
        b = (R + 1) // 2
        Rp = max(b - 1, R - b)
        n = Rp + size
        left = jax.lax.slice_in_dim(x, 0, n, axis=axis)
        right = jax.lax.slice_in_dim(x, b, b + n, axis=axis)
        cond = s >= b
        x = jnp.where(cond, right, left)
        s = s - b * cond.astype(s.dtype)
        R = Rp
    return x


def _pack_offsets(meta):
    """Row offset of each level's window inside the packed [SUM_WH, WW] tile
    (all levels share the column extent; WW differences only shrink the
    readable region)."""
    offs = []
    off = 0
    for (H2, W2) in meta:
        WH, WW = _win_shape(H2, W2)
        offs.append(off)
        off += WH
    return tuple(offs), off


def _win_shape(H2, W2):
    """Cached-window extent per level (whole level when already small)."""
    Hp, Wp = H2 + 2 * _PPAD, W2 + 2 * _PPAD
    return min(Hp, _WIN), min(Wp, _WIN)


def _extract_kernel(meta, ct_ref, *refs):
    """Grid step (e, pb): cut each pixel's per-level window around its
    initial coords.  refs = L volume refs + packed window ref
    [1, 1, SUM_WH, WWmax, PB] + bases_ref [1, 2L, PB] (int32 window
    starts, in padded-volume rows/cols).  Packing every level into ONE
    output tile keeps the per-step DMA descriptor count flat."""
    L = len(meta)
    vrefs = refs[:L]
    wpack_ref = refs[L]
    bases_ref = refs[L + 1]
    offs, _ = _pack_offsets(meta)
    for lvl, (vref, off, (H2, W2)) in enumerate(zip(vrefs, offs, meta)):
        Hp, Wp = H2 + 2 * _PPAD, W2 + 2 * _PPAD
        WH, WW = _win_shape(H2, W2)
        scale = 1.0 / (2.0 ** lvl)
        yf = jnp.floor(ct_ref[0, 1:2, :] * scale).astype(jnp.int32)
        xf = jnp.floor(ct_ref[0, 0:1, :] * scale).astype(jnp.int32)
        # center the 8-tap span inside the window: tap start lands at
        # (WH-8)//2 when unclipped -> +-(WH-8)/2 px of drift tolerance
        by = jnp.clip(yf + _PPAD - 3 - (WH - 8) // 2, 0, Hp - WH)
        bx = jnp.clip(xf + _PPAD - 3 - (WW - 8) // 2, 0, Wp - WW)
        bases_ref[0, 2 * lvl : 2 * lvl + 1, :] = by
        bases_ref[0, 2 * lvl + 1 : 2 * lvl + 2, :] = bx
        v = vref[0, 0]
        w = _tree_take(v, by[None], axis=0, R=Hp - WH, size=WH)
        w = _tree_take(w, bx[None], axis=1, R=Wp - WW, size=WW)
        wpack_ref[0, 0, off : off + WH, :WW, :] = w


def corr_extract_windows_pallas(levels, meta, coords, interpret=False):
    """Cut per-pixel windows from the blocked pyramid, once per keyframe.

    levels[l]: [E, nPB, Hp_l, Wp_l, PB] (corr_build_pmajor_pallas);
    coords: [E, P, 2] level-0 pixels of the FIRST round.
    Returns (wins, bases): wins[l] = [E, nPB, WH_l, WW_l, PB],
    bases = [E, 2L, P] int32 per-level window starts.
    """
    E, P = coords.shape[:2]
    L = len(meta)
    PB = levels[0].shape[-1]
    nPB = levels[0].shape[1]
    Pp = nPB * PB
    coords_t = _pad_p(
        jnp.swapaxes(jax.lax.stop_gradient(coords), 1, 2), Pp, axis=2
    )
    dt = levels[0].dtype

    in_specs = [pl.BlockSpec((1, 2, PB), lambda e, p: (e, 0, p),
                             memory_space=pltpu.VMEM)]
    for v in levels:
        Hp, Wp = v.shape[2:4]
        in_specs.append(
            pl.BlockSpec((1, 1, Hp, Wp, PB), lambda e, p: (e, p, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    offs, sum_wh = _pack_offsets(meta)
    wwmax = max(_win_shape(H2, W2)[1] for (H2, W2) in meta)
    out_specs = [
        pl.BlockSpec((1, 1, sum_wh, wwmax, PB), lambda e, p: (e, p, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * L, PB), lambda e, p: (e, 0, p),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((E, nPB, sum_wh, wwmax, PB), dt),
        jax.ShapeDtypeStruct((E, 2 * L, Pp), jnp.int32),
    ]

    wins, bases = pl.pallas_call(
        functools.partial(_extract_kernel, meta),
        out_shape=out_shapes,
        grid=(E, nPB),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(coords_t.astype(jnp.float32), *levels)
    return wins, bases


def _lookup_windows_kernel(meta, radius, G, PB, ct_ref, bases_ref, wpack_ref,
                           out_ref):
    """Grid step (e, pb-group): pyramid lookup inside the packed cached
    windows for G consecutive pixel blocks.  Grouping amortizes per-step
    DMA latency — the per-block VPU work (~0.7 us) is far below the ~3 us
    DMA issue latency, so ungrouped steps are latency-bound."""
    rd = 2 * radius + 1
    offs, _ = _pack_offsets(meta)
    for g in range(G):
        pb = slice(g * PB, (g + 1) * PB)
        for lvl, (off, (H2, W2)) in enumerate(zip(offs, meta)):
            WH, WW = _win_shape(H2, W2)
            scale = 1.0 / (2.0 ** lvl)
            x0 = ct_ref[0, 0:1, pb] * scale
            y0 = ct_ref[0, 1:2, pb] * scale
            xf = jnp.floor(x0)
            yf = jnp.floor(y0)
            w = wpack_ref[0, g, off : off + WH, :WW, :]  # [WH, WW, PB]
            dy = (y0 - yf)[None].astype(w.dtype)
            dx = (x0 - xf)[None].astype(w.dtype)
            by = bases_ref[0, 2 * lvl : 2 * lvl + 1, pb]
            bx = bases_ref[0, 2 * lvl + 1 : 2 * lvl + 2, pb]
            sy = jnp.clip(yf.astype(jnp.int32) + (_PPAD - radius) - by, 0, WH - 8)[None]
            sx = jnp.clip(xf.astype(jnp.int32) + (_PPAD - radius) - bx, 0, WW - 8)[None]
            w8 = _tree_take(w, sy, axis=0, R=WH - 8, size=8)
            yb = (1 - dy) * w8[:rd] + dy * w8[1 : rd + 1]
            x8 = _tree_take(yb, sx, axis=1, R=WW - 8, size=8)
            xb = (1 - dx) * x8[:, :rd] + dx * x8[:, 1 : rd + 1]
            blk = jnp.swapaxes(xb, 0, 1).reshape(rd * rd, -1)
            out_ref[0, lvl * rd * rd : (lvl + 1) * rd * rd, pb] = blk


@functools.partial(jax.jit, static_argnames=("meta", "radius", "interpret"))
def corr_lookup_windows_pallas(wins, bases, meta, coords, radius=3,
                               interpret=False):
    """Pyramid lookup against the packed cached windows — identical to the
    full blocked lookup whenever window_drift_ok_pallas holds (guaranteed
    by the engine's lax.cond).  wins: [E, nPB, SUM_WH, WWmax, PB]."""
    E, P = coords.shape[:2]
    L = len(meta)
    rd = 2 * radius + 1
    PB = wins.shape[-1]
    nPB = wins.shape[1]
    Pp = nPB * PB
    coords_t = _pad_p(
        jnp.swapaxes(jax.lax.stop_gradient(coords), 1, 2), Pp, axis=2
    )
    dt = wins.dtype
    sum_wh, wwmax = wins.shape[2:4]
    G = 1
    for g in (4, 2):  # pixel blocks per grid step (VMEM-bounded)
        if nPB % g == 0 and g * sum_wh * wwmax * PB * dt.itemsize < 5 * 2**20:
            G = g
            break

    in_specs = [
        pl.BlockSpec((1, 2, G * PB), lambda e, p: (e, 0, p),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * L, G * PB), lambda e, p: (e, 0, p),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, sum_wh, wwmax, PB), lambda e, p: (e, p, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        functools.partial(_lookup_windows_kernel, meta, radius, G, PB),
        out_shape=jax.ShapeDtypeStruct((E, L * rd * rd, Pp), dt),
        grid=(E, nPB // G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L * rd * rd, G * PB),
                               lambda e, p: (e, 0, p),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords_t.astype(jnp.float32), bases, wins)
    return jnp.swapaxes(out, 1, 2)[:, :P]


def window_drift_ok_pallas(bases, meta, coords, radius=3):
    """True iff the windowed lookup equals the full blocked one for every
    pixel at every level.

    Both kernels clip the 8-tap span start: the blocked path to
    [0, Hp - 8] of the padded level, the windowed path to [0, WH - 8] of
    the cached window (padded rows [by, by + WH)).  An out-of-tolerance
    span (sy outside [0, WH - 8]) is therefore only safe when both clips
    land on the SAME padded rows: at the top that requires the pixel fully
    above the image (yl <= 0) AND the cached base clipped to the same edge
    (by == 0) — an interior base would clip onto real volume rows while
    the blocked path reads the zero border; symmetrically at the bottom
    (yl >= Hp - 8 and by == Hp - WH)."""
    coords = jax.lax.stop_gradient(coords)
    bases = bases[:, :, : coords.shape[1]]  # drop the 128-alignment pad
    ok = jnp.bool_(True)
    for lvl, (H2, W2) in enumerate(meta):
        Hp, Wp = H2 + 2 * _PPAD, W2 + 2 * _PPAD
        WH, WW = _win_shape(H2, W2)
        c = coords / (2.0 ** lvl)
        yl = jnp.floor(c[..., 1]).astype(jnp.int32) + (_PPAD - radius)
        xl = jnp.floor(c[..., 0]).astype(jnp.int32) + (_PPAD - radius)
        by = bases[:, 2 * lvl, :]
        bx = bases[:, 2 * lvl + 1, :]
        sy = yl - by
        sx = xl - bx
        bad_y = ((sy < 0) & ((yl > 0) | (by > 0))) | (
            (sy > WH - 8) & ((yl < Hp - 8) | (by < Hp - WH))
        )
        bad_x = ((sx < 0) & ((xl > 0) | (bx > 0))) | (
            (sx > WW - 8) & ((xl < Wp - 8) | (bx < Wp - WW))
        )
        ok = ok & ~jnp.any(bad_y | bad_x)
    return ok


def _build_windows_kernel(meta, out_dtype, f1_ref, f2_ref, ct_ref, *out_refs):
    """Grid step (e, pb): correlation volume block + pyramid levels + cached
    per-pixel windows + bases, in one pass.

    Fusing extraction into the build avoids re-reading the just-written
    pyramid from HBM (the standalone extract costs ~6 ms/keyframe at EuRoC
    scale on v5e; here the windows are cut from the level block while it is
    still in VMEM).  out_refs = L level refs + L window refs + bases_ref.
    """
    L = len(meta)
    lrefs = out_refs[:L]
    wpack_ref = out_refs[L]
    bases_ref = out_refs[L + 1]
    offs, _ = _pack_offsets(meta)

    C = f1_ref.shape[-1]
    H, W = f2_ref.shape[1], f2_ref.shape[2]
    PB = f1_ref.shape[1]
    f1 = f1_ref[0]
    f2 = f2_ref[0].reshape(H * W, C)
    v = jax.lax.dot_general(
        f2, f1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / 16.0)
    v = v.astype(out_dtype).reshape(H, W, PB)

    for lvl, (o_ref, off, (H2, W2)) in enumerate(zip(lrefs, offs, meta)):
        Hp, Wp = H2 + 2 * _PPAD, W2 + 2 * _PPAD
        WH, WW = _win_shape(H2, W2)
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        o_ref[0, 0, _PPAD : _PPAD + H2, _PPAD : _PPAD + W2, :] = v

        scale = 1.0 / (2.0 ** lvl)
        yf = jnp.floor(ct_ref[0, 1:2, :] * scale).astype(jnp.int32)
        xf = jnp.floor(ct_ref[0, 0:1, :] * scale).astype(jnp.int32)
        by = jnp.clip(yf + _PPAD - 3 - (WH - 8) // 2, 0, Hp - WH)
        bx = jnp.clip(xf + _PPAD - 3 - (WW - 8) // 2, 0, Wp - WW)
        bases_ref[0, 2 * lvl : 2 * lvl + 1, :] = by
        bases_ref[0, 2 * lvl + 1 : 2 * lvl + 2, :] = bx
        vp = o_ref[0, 0]  # padded level, still in VMEM
        w = _tree_take(vp, by[None], axis=0, R=Hp - WH, size=WH)
        w = _tree_take(w, bx[None], axis=1, R=Wp - WW, size=WW)
        wpack_ref[0, 0, off : off + WH, :WW, :] = w

        if lvl + 1 < L:
            h, w2 = H2 // 2, W2 // 2
            x = v[: 2 * h, : 2 * w2].reshape(h, 2, w2, 2, PB)
            v = (
                x[:, 0, :, 0] + x[:, 0, :, 1] + x[:, 1, :, 0] + x[:, 1, :, 1]
            ) * jnp.asarray(0.25, v.dtype)


def corr_build_windows_pallas(f1, f2, coords_init, num_levels=4,
                              dtype=jnp.bfloat16, block_p=256,
                              interpret=False):
    """Fused volume build + pyramid + per-pixel window cache, one kernel.

    Returns (levels, wins, bases, meta, PB) — levels feed the drift
    fallback (corr_lookup_blocked_pallas), wins/bases the per-round
    windowed lookup.  See corr_build_pmajor_pallas / corr_extract_windows_
    pallas for the individual semantics (identical)."""
    E, H1, W1, C = f1.shape
    H, W = int(f2.shape[1]), int(f2.shape[2])
    P = int(H1) * int(W1)
    Pp = _round_up128(P)
    PB = _pick_pb(Pp, block_p)
    nPB = Pp // PB

    meta = []
    h, w = H, W
    for _ in range(num_levels):
        meta.append((h, w))
        h, w = h // 2, w // 2
    meta = tuple(meta)
    L = num_levels

    coords_t = _pad_p(
        jnp.swapaxes(jax.lax.stop_gradient(coords_init), 1, 2), Pp, axis=2
    )

    in_specs = [
        pl.BlockSpec((1, PB, C), lambda e, p: (e, p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, W, C), lambda e, p: (e, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, PB), lambda e, p: (e, 0, p),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = []
    out_shapes = []
    for (H2, W2) in meta:
        Hp, Wp = H2 + 2 * _PPAD, W2 + 2 * _PPAD
        out_specs.append(
            pl.BlockSpec((1, 1, Hp, Wp, PB), lambda e, p: (e, p, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((E, nPB, Hp, Wp, PB), dtype))
    offs, sum_wh = _pack_offsets(meta)
    wwmax = max(_win_shape(H2, W2)[1] for (H2, W2) in meta)
    out_specs.append(
        pl.BlockSpec((1, 1, sum_wh, wwmax, PB), lambda e, p: (e, p, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    out_shapes.append(jax.ShapeDtypeStruct((E, nPB, sum_wh, wwmax, PB), dtype))
    out_specs.append(pl.BlockSpec((1, 2 * L, PB), lambda e, p: (e, 0, p),
                                  memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((E, 2 * L, Pp), jnp.int32))

    outs = pl.pallas_call(
        functools.partial(_build_windows_kernel, meta, dtype),
        out_shape=out_shapes,
        grid=(E, nPB),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(_pad_p(f1.reshape(E, P, C), Pp, axis=1), f2, coords_t.astype(jnp.float32))
    return list(outs[:L]), outs[L], outs[L + 1], meta, PB


def _build_windows_light_kernel(meta, out_dtype, f1_ref, f2_ref, ct_ref,
                                wpack_ref, bases_ref, scratch):
    """Grid step (e, pb): like _build_windows_kernel but WITHOUT writing the
    pyramid levels to HBM — only the packed windows + bases.  Saves the
    ~1.9 GB/keyframe of level writes; the engine's drift fallback rebuilds
    the pyramid on demand (rare).  scratch: [Hp0, Wp0, PB] VMEM."""
    L = len(meta)
    offs, _ = _pack_offsets(meta)
    C = f1_ref.shape[-1]
    H, W = f2_ref.shape[1], f2_ref.shape[2]
    PB = f1_ref.shape[1]
    f1 = f1_ref[0]
    f2 = f2_ref[0].reshape(H * W, C)
    v = jax.lax.dot_general(
        f2, f1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / 16.0)
    v = v.astype(out_dtype).reshape(H, W, PB)

    for lvl, (off, (H2, W2)) in enumerate(zip(offs, meta)):
        Hp, Wp = H2 + 2 * _PPAD, W2 + 2 * _PPAD
        WH, WW = _win_shape(H2, W2)
        scratch[:Hp, :Wp, :] = jnp.zeros((Hp, Wp, PB), out_dtype)
        scratch[_PPAD : _PPAD + H2, _PPAD : _PPAD + W2, :] = v

        scale = 1.0 / (2.0 ** lvl)
        yf = jnp.floor(ct_ref[0, 1:2, :] * scale).astype(jnp.int32)
        xf = jnp.floor(ct_ref[0, 0:1, :] * scale).astype(jnp.int32)
        by = jnp.clip(yf + _PPAD - 3 - (WH - 8) // 2, 0, Hp - WH)
        bx = jnp.clip(xf + _PPAD - 3 - (WW - 8) // 2, 0, Wp - WW)
        bases_ref[0, 2 * lvl : 2 * lvl + 1, :] = by
        bases_ref[0, 2 * lvl + 1 : 2 * lvl + 2, :] = bx
        vp = scratch[:Hp, :Wp, :]
        w = _tree_take(vp, by[None], axis=0, R=Hp - WH, size=WH)
        w = _tree_take(w, bx[None], axis=1, R=Wp - WW, size=WW)
        wpack_ref[0, 0, off : off + WH, :WW, :] = w

        if lvl + 1 < L:
            h, w2 = H2 // 2, W2 // 2
            x = v[: 2 * h, : 2 * w2].reshape(h, 2, w2, 2, PB)
            v = (
                x[:, 0, :, 0] + x[:, 0, :, 1] + x[:, 1, :, 0] + x[:, 1, :, 1]
            ) * jnp.asarray(0.25, v.dtype)


def corr_build_windows_light_pallas(f1, f2, coords_init, num_levels=4,
                                    dtype=jnp.bfloat16, block_p=256,
                                    interpret=False):
    """Window cache + bases only — the pyramid never touches HBM.

    Returns (wins, bases, meta, PB).  Pair with a drift fallback that
    rebuilds via corr_build_pmajor_pallas + corr_lookup_blocked_pallas."""
    E, H1, W1, C = f1.shape
    H, W = int(f2.shape[1]), int(f2.shape[2])
    P = int(H1) * int(W1)
    Pp = _round_up128(P)
    PB = _pick_pb(Pp, block_p)
    nPB = Pp // PB

    meta = []
    h, w = H, W
    for _ in range(num_levels):
        meta.append((h, w))
        h, w = h // 2, w // 2
    meta = tuple(meta)
    L = num_levels

    coords_t = _pad_p(
        jnp.swapaxes(jax.lax.stop_gradient(coords_init), 1, 2), Pp, axis=2
    )
    offs, sum_wh = _pack_offsets(meta)
    wwmax = max(_win_shape(H2, W2)[1] for (H2, W2) in meta)
    Hp0, Wp0 = H + 2 * _PPAD, W + 2 * _PPAD

    wins, bases = pl.pallas_call(
        functools.partial(_build_windows_light_kernel, meta, dtype),
        out_shape=[
            jax.ShapeDtypeStruct((E, nPB, sum_wh, wwmax, PB), dtype),
            jax.ShapeDtypeStruct((E, 2 * L, Pp), jnp.int32),
        ],
        grid=(E, nPB),
        in_specs=[
            pl.BlockSpec((1, PB, C), lambda e, p: (e, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda e, p: (e, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, PB), lambda e, p: (e, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, sum_wh, wwmax, PB),
                         lambda e, p: (e, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * L, PB), lambda e, p: (e, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((Hp0, Wp0, PB), dtype)],
        interpret=interpret,
    )(_pad_p(f1.reshape(E, P, C), Pp, axis=1), f2, coords_t.astype(jnp.float32))
    return wins, bases, meta, PB
