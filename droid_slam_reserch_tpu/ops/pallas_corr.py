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
    PB = min(block_p, P)
    while P % PB:  # largest divisor <= block_p (lane padding handles the rest)
        PB -= 1
    coords_t = jnp.swapaxes(jax.lax.stop_gradient(coords), 1, 2)  # [E, 2, P]
    dt = padded[0].dtype

    grid = (E, P // PB)
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
        out_shape=jax.ShapeDtypeStruct((E, L * rd * rd, P), dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(coords_t.astype(jnp.float32), *padded)
    return jnp.swapaxes(out, 1, 2)  # [E, P, L*rd*rd]


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
    PB = min(block_p, P)
    while P % PB:
        PB -= 1
    nPB = P // PB

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
    )(f1.reshape(E, P, C), f2)
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
    coords_t = jnp.swapaxes(jax.lax.stop_gradient(coords), 1, 2)
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
        out_shape=jax.ShapeDtypeStruct((E, L * rd * rd, P), dt),
        grid=(E, P // PB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L * rd * rd, PB), lambda e, p: (e, 0, p),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords_t.astype(jnp.float32), *levels)
    return jnp.swapaxes(out, 1, 2)
