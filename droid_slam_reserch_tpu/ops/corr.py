"""Correlation volumes and radius-3 bilinear lookup — pure XLA.

TPU-native replacement for the reference CUDA kernels:

- all-pairs volume + pyramid + indexed lookup: reference
  droid_slam/modules/corr.py:23-71 + src/correlation_kernels.cu:19-124
- fused on-the-fly correlation ("altcorr"): reference modules/corr.py:74-139
  + src/altcorr_kernel.cu:27-356

Conventions preserved exactly (they matter for droid.pth weight parity):
- features are scaled by 1/4 each, so dot products carry 1/16
- lookup channel order is x_offset-major: channel = a * (2r+1) + b where a
  indexes the x offset and b the y offset (correlation_kernels.cu:47-69)
- bilinear taps outside the volume contribute zero (within_bounds)
- pyramid levels are built by 2x average pooling; level l is sampled at
  coords / 2**l with the same radius; level channels are concatenated in
  level order (modules/corr.py:35-50)

The fused path exploits that the feature dot product is linear in the
bilinear taps: correlate integer-offset patches first, then bilinearly blend
the scalar correlations — identical math to altcorr's fused sampling but
expressed as batched matmuls that ride the MXU.

Layout is channels-last [E, H, W, C] throughout (TPU lane dim = C).
"""
import jax
import jax.numpy as jnp


def corr_volume(f1, f2, dtype=None):
    """All-pairs correlation volume (reference modules/corr.py:63-71).

    f1: [E, H1, W1, C], f2: [E, H2, W2, C] -> [E, H1, W1, H2, W2], scaled 1/16.
    Accumulates in fp32 on the MXU; `dtype` (e.g. bf16 on TPU) sets the
    storage dtype of the volume — it is the hot path's largest array, so
    halving it halves every later read of it.
    """
    E, H1, W1, C = f1.shape
    H2, W2 = f2.shape[1:3]
    v = jnp.einsum(
        "exyc,euvc->exyuv",
        f1.astype(jnp.float32),
        f2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    v = v / 16.0
    return v.astype(dtype) if dtype is not None else v


def corr_volume_flat(f1, f2, dtype=None):
    """All-pairs correlation volume in flat-pixel form.

    f1: [E, H1, W1, C], f2: [E, H2, W2, C] -> [E, H1*W1, H2, W2], scaled
    1/16.  Emitting the flat form directly from the einsum avoids the two
    full-volume layout copies XLA inserts between the 5-D volume and its
    flat consumers (measured ~16 ms/keyframe at EuRoC scale on v5e).
    """
    E, H1, W1, C = f1.shape
    v = jnp.einsum(
        "epc,ehwc->ephw",
        f1.reshape(E, H1 * W1, C).astype(jnp.float32),
        f2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    v = v / 16.0
    return v.astype(dtype) if dtype is not None else v


def pool2x_volume(vol):
    """2x average pool over the last two (target) dims of [E,H1,W1,H2,W2].

    Odd trailing rows/cols are dropped (torch avg_pool2d floor semantics).
    """
    E, H1, W1, H2, W2 = vol.shape
    h, w = H2 // 2, W2 // 2
    v = vol[..., : 2 * h, : 2 * w].reshape(E, H1, W1, h, 2, w, 2)
    # explicit slice-sum: jnp.mean on bf16 accumulates in f32, which
    # materializes a full f32 copy of the volume (measured 12 ms/keyframe
    # on v5e); four native-dtype adds are exact for the 1/4 scale
    return (
        v[..., 0, :, 0] + v[..., 0, :, 1] + v[..., 1, :, 0] + v[..., 1, :, 1]
    ) * jnp.asarray(0.25, vol.dtype)


def pool2x_fmap(f):
    """2x average pool over the spatial dims of [E, H, W, C] (floor semantics)."""
    E, H, W, C = f.shape
    h, w = H // 2, W // 2
    return f[:, : 2 * h, : 2 * w].reshape(E, h, 2, w, 2, C).mean(axis=(2, 4))


def build_pyramid(vol, num_levels=4):
    """Volume pyramid (reference modules/corr.py:35-38)."""
    pyr = [vol]
    for _ in range(num_levels - 1):
        vol = pool2x_volume(vol)
        pyr.append(vol)
    return pyr


def _patch_weights(coords):
    """Split coords into integer base and bilinear fractions."""
    x0, y0 = coords[..., 0], coords[..., 1]
    xf = jnp.floor(x0)
    yf = jnp.floor(y0)
    dx = x0 - xf
    dy = y0 - yf
    return xf.astype(jnp.int32), yf.astype(jnp.int32), dx, dy


def _interp_matrices(coords, H2, W2, radius, off_y=None, off_x=None):
    """Per-pixel sparse bilinear interpolation matrices.

    For each pixel with float lookup centre (x, y), the (2r+1) taps along an
    axis sample at x - r + a; each is a 2-point bilinear blend of integer
    columns.  We materialize those weights as [..., 2r+1, W2] (resp. H2)
    matrices with exactly two nonzeros per row — out-of-range taps become
    all-zero rows, reproducing corr_index_forward's zero padding
    (reference src/correlation_kernels.cu:47-69, within_bounds).

    Gathers along the TPU lane dimension do not vectorize (measured ~500 ms
    per lookup at EuRoC scale on v5e); contracting these matrices on the
    MXU instead is ~3 orders of magnitude faster.

    Gradients are stopped through the coords (the reference's CUDA sampler
    differentiates the volume only, correlation_kernels.cu:73-124).
    """
    coords = jax.lax.stop_gradient(coords)
    xf, yf, dx, dy = _patch_weights(coords)
    rd = 2 * radius + 1
    taps = jnp.arange(rd, dtype=jnp.int32) - radius
    # integer offsets let windowed/padded volumes reuse this path with the
    # raw coords (adding a float offset to the coords instead would round
    # the bilinear fractions — measured ~2e-6 parity error)
    ioh = jnp.arange(H2, dtype=jnp.int32)
    iow = jnp.arange(W2, dtype=jnp.int32)
    if off_y is not None:
        ioh = ioh + jnp.asarray(off_y, jnp.int32)[..., None, None]
    if off_x is not None:
        iow = iow + jnp.asarray(off_x, jnp.int32)[..., None, None]
    # [..., rd, 1] integer base per tap
    yc = yf[..., None, None] + taps[:, None]
    xc = xf[..., None, None] + taps[:, None]
    dy = dy[..., None, None]
    dx = dx[..., None, None]
    Wy = (1.0 - dy) * (ioh == yc) + dy * (ioh == yc + 1)  # [..., rd, H2]
    Wx = (1.0 - dx) * (iow == xc) + dx * (iow == xc + 1)  # [..., rd, W2]
    return Wy, Wx


def corr_lookup(vol, coords, radius=3):
    """Indexed bilinear lookup into a correlation volume.

    vol: [E, H1, W1, H2, W2]; coords: [E, H1, W1, 2] (x, y) in level pixels.
    Returns [E, H1, W1, (2r+1)**2] with reference channel order a*(2r+1)+b
    (a = x tap, b = y tap).  Mirrors corr_index_forward
    (correlation_kernels.cu:19-70); differentiable through the volume.

    Implemented as two per-pixel interpolation-matrix contractions (gathers
    become MXU matmuls — see _interp_matrices).
    """
    E, H1, W1, H2, W2 = vol.shape
    return _corr_lookup_flat(
        vol.reshape(E, H1 * W1, H2, W2), coords.reshape(E, H1 * W1, 2), radius
    ).reshape(E, H1, W1, (2 * radius + 1) ** 2)


def _corr_lookup_flat(volp, coords, radius, off_y=None, off_x=None):
    """corr_lookup on flat pixels: volp [E,P,H2,W2], coords [E,P,2] ->
    [E,P,rd*rd] (channel a*rd+b).  off_y/off_x map volume indices to the
    coords' frame (windowed/padded volumes)."""
    E, P, H2, W2 = volp.shape
    rd = 2 * radius + 1
    Wy, Wx = _interp_matrices(coords, H2, W2, radius, off_y, off_x)
    Wy = Wy.astype(volp.dtype)
    Wx = Wx.astype(volp.dtype)
    # rows: [E,P,b,W2] then taps: [E,P,a,b]
    tmp = jnp.einsum("epbh,ephw->epbw", Wy, volp)
    out = jnp.einsum("epbw,epaw->epab", tmp, Wx)
    return out.reshape(E, P, rd * rd)


def pool2x_volume_flat(volp):
    """2x average pool over the trailing dims of a flat [E,P,H2,W2] volume."""
    E, P, H2, W2 = volp.shape
    h, w = H2 // 2, W2 // 2
    v = volp[..., : 2 * h, : 2 * w].reshape(E, P, h, 2, w, 2)
    return (
        v[..., 0, :, 0] + v[..., 0, :, 1] + v[..., 1, :, 0] + v[..., 1, :, 1]
    ) * jnp.asarray(0.25, volp.dtype)


def build_pyramid_flat(volp, num_levels=4):
    """Volume pyramid on flat [E,P,H2,W2] volumes (layout-stable on TPU)."""
    pyr = [volp]
    for _ in range(num_levels - 1):
        volp = pool2x_volume_flat(volp)
        pyr.append(volp)
    return pyr


def corr_lookup_pyramid_flat(pyramid, coords, radius=3):
    """Pyramid lookup on flat volumes: pyramid of [E,P,h,w], coords [E,P,2]
    -> [E,P,L*(2r+1)**2], level-major.  The flat-pixel form keeps every
    intermediate in the default {3,2,1,0} layout — the 5D form costs ~2.5
    ms/round of layout copies at EuRoC scale on v5e.

    Kept strictly per-level: packing levels into one batched matmul pair
    (fewer, larger batched ops) was tried twice and measured SLOWER — XLA
    only pattern-fuses the one-hot construction into the matmul for the
    simple single-level einsum; packed variants materialize the [E,P,·,·]
    interpolation operands (~500 MB/round) and add layout copies."""
    out = [
        _corr_lookup_flat(vol, coords / (2.0 ** lvl), radius)
        for lvl, vol in enumerate(pyramid)
    ]
    return jnp.concatenate(out, axis=-1)


def corr_lookup_pyramid(pyramid, coords, radius=3):
    """Lookup at every pyramid level, concatenated (reference corr.py:40-50).

    Returns [E, H, W, L*(2r+1)**2], level-major channel order.
    """
    E, H1, W1 = pyramid[0].shape[:3]
    flat = [v.reshape(E, H1 * W1, *v.shape[3:]) for v in pyramid]
    out = corr_lookup_pyramid_flat(flat, coords.reshape(E, H1 * W1, 2), radius)
    return out.reshape(E, H1, W1, out.shape[-1])


def pack_pyramid(pyramid):
    """Pack all pyramid levels into one per-pixel [K, Wp] tile.

    pyramid: list of [E, H1, W1, H2_l, W2_l] volumes.  Levels are placed in
    disjoint column ranges (all starting at row 0) of a single
    [E, H1, W1, H2_0, sum(W2_l)] array; on TPU the lane dim is padded to 128
    anyway, so for the standard 4-level pyramid with W2_0 <= 64 the packing
    is free.

    Why: a per-pixel lookup is a batched tiny matmul; on TPU each batched
    op costs ~2 ms of fixed per-element latency at SLAM scale, so 4 levels x
    2 stages = 8 ops dominate the frontend round.  Packing makes the whole
    pyramid lookup exactly ONE batched matmul pair (see packed_lookup):
    cross-level products appear in the [28, 28] tap output but are
    discarded, because each level's x-stage selector only has support on
    its own column range.

    Returns (packed, meta) with meta = tuple of (H2_l, W2_l, col_off_l).
    """
    E, H1, W1, H2, W2 = pyramid[0].shape
    meta = []
    off = 0
    for v in pyramid:
        h2, w2 = v.shape[3:]
        meta.append((h2, w2, off))
        off += w2
    packed = jnp.zeros((E, H1, W1, H2, off), pyramid[0].dtype)
    for v, (h2, w2, o) in zip(pyramid, meta):
        packed = packed.at[:, :, :, :h2, o : o + w2].set(v)
    return packed, tuple(meta)


def packed_lookup(packed, meta, coords, radius=3):
    """Pyramid lookup against a pack_pyramid volume — one batched matmul pair.

    packed: [E, H1, W1, K, Wp]; coords: [E, H1, W1, 2] in level-0 pixels.
    Returns [E, H1, W1, L*(2r+1)**2] bit-identical in semantics to
    corr_lookup_pyramid (level-major, channel = a*(2r+1)+b, a = x tap;
    out-of-range taps are zero), reference correlation_kernels.cu:19-70 +
    modules/corr.py:40-50.
    """
    E, H1, W1, K, Wp = packed.shape
    L = len(meta)
    rd = 2 * radius + 1
    P = H1 * W1
    coords = jax.lax.stop_gradient(coords).reshape(E, P, 2)
    taps = jnp.arange(rd, dtype=jnp.int32) - radius
    iok = jnp.arange(K, dtype=jnp.int32)
    iow = jnp.arange(Wp, dtype=jnp.int32)

    Wy = []
    Wx = []
    for lvl, (h2, w2, off) in enumerate(meta):
        c = coords / (2.0 ** lvl)
        x0, y0 = c[..., 0], c[..., 1]
        xf = jnp.floor(x0)
        yf = jnp.floor(y0)
        dx = (x0 - xf)[..., None, None]
        dy = (y0 - yf)[..., None, None]
        yc = yf.astype(jnp.int32)[..., None, None] + taps[:, None]
        xc = xf.astype(jnp.int32)[..., None, None] + taps[:, None]
        # per-corner validity (reference within_bounds): taps whose integer
        # corner leaves [0, h2) x [0, w2) contribute zero
        wy0 = jnp.where((yc >= 0) & (yc < h2), 1.0 - dy, 0.0)
        wy1 = jnp.where((yc + 1 >= 0) & (yc + 1 < h2), dy, 0.0)
        Wy.append(wy0 * (iok == yc) + wy1 * (iok == yc + 1))
        wx0 = jnp.where((xc >= 0) & (xc < w2), 1.0 - dx, 0.0)
        wx1 = jnp.where((xc + 1 >= 0) & (xc + 1 < w2), dx, 0.0)
        Wx.append(wx0 * (iow == xc + off) + wx1 * (iow == xc + 1 + off))
    Wy = jnp.concatenate(Wy, axis=2).astype(packed.dtype)  # [E,P,L*rd,K]
    Wx = jnp.concatenate(Wx, axis=2).astype(packed.dtype)  # [E,P,L*rd,Wp]

    volp = packed.reshape(E, P, K, Wp)
    tmp = jnp.einsum("epbk,epkw->epbw", Wy, volp)      # y taps (b level-major)
    full = jnp.einsum("epbw,epaw->epba", tmp, Wx)      # [E,P,L*rd(b),L*rd(a)]
    full = full.reshape(E, P, L, rd, L, rd)
    # keep the diagonal level blocks; cross-level products are the discarded
    # cost of the single-matmul formulation
    out = jnp.stack([full[:, :, l, :, l, :] for l in range(L)], axis=2)
    # [E,P,L,b(y),a(x)] -> channel order a*rd + b within each level
    out = out.transpose(0, 1, 2, 4, 3)
    return out.reshape(E, H1, W1, L * rd * rd)


# --------------------------------------------------------------------------
# Pixels-last ("P-major") lookup — the TPU-native gather.
#
# Any per-pixel batched matmul on TPU pays MXU tile padding per batch
# element, so the one-hot contraction lookup costs the same whether it
# reads 24 or 64 volume rows (~14-23 ms/round at EuRoC scale on v5e).
# Storing the volume as [E, H2, W2, P] instead puts the gathered dims on
# MAJOR axes: slicing at any offset is free, and resolving each pixel's
# 8-row tap window becomes a binary tree of `where` selects with the
# per-pixel condition broadcast across lanes — pure, fusable VPU work.
# The volume is zero-padded by 8 on each side so out-of-image taps read
# zeros, reproducing within_bounds (correlation_kernels.cu:47-69) with no
# masks; clamped window starts land entirely inside the zero border.
# --------------------------------------------------------------------------

_PPAD = 8  # zero border on each side of each P-major volume level


def corr_volume_pmajor(f1, f2, dtype=None):
    """All-pairs correlation volume in pixels-last form.

    f1: [E, H1, W1, C], f2: [E, H2, W2, C] -> [E, H2, W2, H1*W1], 1/16.
    """
    E, H1, W1, C = f1.shape
    v = jnp.einsum(
        "epc,ehwc->ehwp",
        f1.reshape(E, H1 * W1, C).astype(jnp.float32),
        f2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    v = v / 16.0
    return v.astype(dtype) if dtype is not None else v


def pool2x_pmajor(v):
    """2x average pool over the (major) spatial dims of [E, H, W, P]."""
    E, H, W, P = v.shape
    h, w = H // 2, W // 2
    x = v[:, : 2 * h, : 2 * w].reshape(E, h, 2, w, 2, P)
    return (
        x[:, :, 0, :, 0] + x[:, :, 0, :, 1] + x[:, :, 1, :, 0] + x[:, :, 1, :, 1]
    ) * jnp.asarray(0.25, v.dtype)


def build_pyramid_pmajor(f1, f2, num_levels=4, dtype=None):
    """Padded P-major volume pyramid + meta of (H2, W2) per level."""
    vol = corr_volume_pmajor(f1, f2, dtype=dtype)
    pyr = [vol]
    for _ in range(num_levels - 1):
        vol = pool2x_pmajor(vol)
        pyr.append(vol)
    padded = [
        jnp.pad(v, ((0, 0), (_PPAD, _PPAD), (_PPAD, _PPAD), (0, 0)))
        for v in pyr
    ]
    meta = tuple(v.shape[1:3] for v in pyr)
    return padded, meta


def _tree_take8(x, s, axis, R):
    """Per-lane window select: returns x[..., s:s+8, ...] along `axis`.

    x has R+8 entries along `axis`; s (broadcastable int32 against x with
    that axis at extent 1) is in [0, R].  A binary tree of major-axis
    slices + `where` selects — each stage halves the range; slicing major
    axes is free on TPU, and the select chain fuses into a single pass.
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


def corr_lookup_pmajor(padded, meta, coords, radius=3):
    """Pyramid lookup on a padded P-major volume: [E, P, L*(2r+1)**2].

    Semantics identical to corr_lookup_pyramid_flat (channel a*(2r+1)+b,
    a = x tap; zero outside the image; level-major concat); arithmetic
    differs only in bilinear blend association (two VPU fmas instead of an
    MXU two-term dot).
    """
    coords = jax.lax.stop_gradient(coords)
    E, P = coords.shape[:2]
    rd = 2 * radius + 1
    outs = []
    for lvl, (v, (H2, W2)) in enumerate(zip(padded, meta)):
        Hp, Wp = v.shape[1:3]
        c = coords / (2.0 ** lvl)
        x0, y0 = c[..., 0], c[..., 1]
        xf = jnp.floor(x0)
        yf = jnp.floor(y0)
        dy = (y0 - yf)[:, None, None, :].astype(v.dtype)
        dx = (x0 - xf)[:, None, None, :].astype(v.dtype)
        sy = jnp.clip(yf.astype(jnp.int32) + (_PPAD - radius), 0, Hp - 8)
        sx = jnp.clip(xf.astype(jnp.int32) + (_PPAD - radius), 0, Wp - 8)
        w8 = _tree_take8(v, sy[:, None, None, :], axis=1, R=Hp - 8)  # [E,8,Wp,P]
        yb = (1 - dy) * w8[:, :rd] + dy * w8[:, 1 : rd + 1]          # [E,7,Wp,P]
        x8 = _tree_take8(yb, sx[:, None, None, :], axis=2, R=Wp - 8)  # [E,7,8,P]
        xb = (1 - dx) * x8[:, :, :rd] + dx * x8[:, :, 1 : rd + 1]    # [E,7b,7a,P]
        outs.append(jnp.swapaxes(xb, 1, 2).reshape(E, rd * rd, P))
    cat = jnp.concatenate(outs, axis=1)          # [E, L*49, P]
    return jnp.swapaxes(cat, 1, 2)               # [E, P, L*49]


# --------------------------------------------------------------------------
# Windowed lookup with per-keyframe window caching.
#
# The full-volume lookup reads every volume row per pixel per round (the
# one-hot contraction touches all H2 rows); at EuRoC scale that is ~14 ms
# per frontend round on v5e — the single largest cost in the engine.  But
# the frontend runs ~6 rounds per keyframe and the lookup coords (the
# reprojection) move by well under a pixel between rounds once BA starts
# converging.  So: once per keyframe, extract a per-pixel 24x24 window
# around the initial coords from an 8-zero-padded volume (pure 8-aligned
# slab selection — block one-hot matmuls that read the volume once), and
# per round run the exact bilinear lookup inside the cached windows.
# Selection is exact (0/1 matmuls) and the in-window fine lookup performs
# the same two-term bilinear sums as the full path, so results agree to
# <= 1 ulp (only FMA reassociation across the shorter contraction differs)
# whenever the taps stay inside the window; a
# per-call `bad` flag (lax.cond'ed in the engine) falls back to the full
# path when any pixel drifts out (> ~8 px between rounds).
#
# Reference semantics preserved: zero padding reproduces within_bounds
# zeroing (correlation_kernels.cu:47-69) because out-of-image taps land in
# the zero border.
# --------------------------------------------------------------------------

_WPAD = 8          # zero-pad on each side of each volume level
_WWIN = 24         # window extent (rows and cols)
_WTOL = _WWIN - _WPAD  # max local window start (drift tolerance bound)


def _round_up8(x):
    return ((x + 7) // 8) * 8


def pad_pyramid_flat(pyramid):
    """Zero-pad each [E,P,H2,W2] level by 8 on every side (rounded up to
    multiples of 8 rows/cols).  Returns (padded_levels, meta) with meta a
    tuple of (H2, W2, Hp, Wp) per level."""
    out = []
    meta = []
    for v in pyramid:
        E, P, H2, W2 = v.shape
        Hp, Wp = _round_up8(H2 + 2 * _WPAD), _round_up8(W2 + 2 * _WPAD)
        out.append(jnp.pad(v, ((0, 0), (0, 0), (_WPAD, Hp - H2 - _WPAD),
                               (_WPAD, Wp - W2 - _WPAD))))
        meta.append((H2, W2, Hp, Wp))
    return out, tuple(meta)


def window_bases(coords, meta, radius=3):
    """8-aligned per-pixel window bases from level-0 coords.

    coords: [E, P, 2].  Returns list of (by, bx) int32 [E, P] per level
    (None for levels whose padded volume is not larger than the window —
    those use the full padded level directly)."""
    coords = jax.lax.stop_gradient(coords)
    bases = []
    for lvl, (H2, W2, Hp, Wp) in enumerate(meta):
        if Hp <= _WWIN and Wp <= _WWIN:
            bases.append(None)
            continue
        c = coords / (2.0 ** lvl)
        # padded row/col of the first tap (floor - radius + pad)
        ylc = jnp.floor(c[..., 1]).astype(jnp.int32) - radius + _WPAD
        xlc = jnp.floor(c[..., 0]).astype(jnp.int32) - radius + _WPAD
        # round the base to the nearest slab so the initial window start
        # lands in [4, 11] — at least +-4 px of drift tolerance each way
        by = jnp.clip(((ylc + 4) // 8) * 8 - 8, 0, max(Hp - _WWIN, 0))
        bx = jnp.clip(((xlc + 4) // 8) * 8 - 8, 0, max(Wp - _WWIN, 0))
        bases.append((by, bx))
    return bases


def extract_windows(padded, meta, bases):
    """Per-pixel 24x24 windows via 8-aligned slab selection.

    Each selection matmul is a one-hot over whole 8-row (8-col) slabs, so
    the volume is read exactly once and the extracted values are exact."""
    wins = []
    for vol, (H2, W2, Hp, Wp), base in zip(padded, meta, bases):
        if base is None:
            wins.append(vol)
            continue
        E, P = vol.shape[:2]
        ns = _WWIN // 8
        by, bx = base
        qy = by // 8
        qx = bx // 8
        s = jnp.arange(ns, dtype=jnp.int32)
        # rows: [E,P,ns,Hp/8] one-hot of slabs qy..qy+2
        ohy = (qy[..., None, None] + s[:, None] ==
               jnp.arange(Hp // 8, dtype=jnp.int32)).astype(vol.dtype)
        v5 = vol.reshape(E, P, Hp // 8, 8 * Wp)
        t = jnp.einsum("epsq,epqw->epsw", ohy, v5).reshape(E, P, _WWIN, Wp)
        # cols
        ohx = (qx[..., None, None] + s[:, None] ==
               jnp.arange(Wp // 8, dtype=jnp.int32)).astype(vol.dtype)
        t2 = t.reshape(E, P, _WWIN, Wp // 8, 8)
        w = jnp.einsum("epsq,eprqw->eprsw", ohx, t2).reshape(E, P, _WWIN, _WWIN)
        wins.append(w)
    return wins


def window_drift_ok(coords, meta, bases, radius=3):
    """True iff every pixel's taps stay inside its cached window (so the
    windowed lookup matches the full lookup to <= 1 ulp)."""
    coords = jax.lax.stop_gradient(coords)
    ok = jnp.bool_(True)
    for lvl, ((H2, W2, Hp, Wp), base) in enumerate(zip(meta, bases)):
        if base is None:
            continue
        c = coords / (2.0 ** lvl)
        ylc = jnp.floor(c[..., 1]).astype(jnp.int32) - radius + _WPAD
        xlc = jnp.floor(c[..., 0]).astype(jnp.int32) - radius + _WPAD
        by, bx = base
        sy = ylc - by
        sx = xlc - bx
        # a pixel is fine if its window start is within tolerance OR all of
        # its taps land on zero rows/cols (outside [pad, pad + H2) both the
        # full path's within_bounds zeroing and the window path yield 0)
        bad_y = ((sy < 0) | (sy > _WTOL)) & (ylc >= 0) & (ylc <= H2 + _WPAD - 1)
        bad_x = ((sx < 0) | (sx > _WTOL)) & (xlc >= 0) & (xlc <= W2 + _WPAD - 1)
        ok = ok & ~jnp.any(bad_y | bad_x)
    return ok


def corr_lookup_windows(wins, meta, bases, coords, radius=3):
    """Exact pyramid lookup against cached windows: [E,P,L*(2r+1)**2].

    Mirrors corr_lookup_pyramid_flat to <= 1 ulp while taps stay in-window
    (same two-stage one-hot contractions, same dtypes, same channel order;
    only FMA grouping over the shorter contraction differs)."""
    out = []
    for lvl, (win, (H2, W2, Hp, Wp), base) in enumerate(zip(wins, meta, bases)):
        c = coords / (2.0 ** lvl)
        if base is None:
            off_y = off_x = -_WPAD
        else:
            by, bx = base
            off_y = by - _WPAD
            off_x = bx - _WPAD
        out.append(_corr_lookup_flat(win, c, radius, off_y, off_x))
    return jnp.concatenate(out, axis=-1)


def altcorr(f1, f2, coords, radius=3):
    """Fused on-the-fly correlation lookup (reference altcorr_kernel.cu:27-149).

    f1: [E, H1, W1, C] source features (level 0); f2: [E, H2, W2, C] target
    features at this pyramid level; coords: [E, H1, W1, 2] in level pixels.
    Returns [E, H1, W1, (2r+1)**2], scaled 1/16 — numerically identical to
    corr_lookup(corr_volume(f1, f2), coords) but O(E*HW*C) memory.

    The dot product is linear in the bilinear taps, so sampling the feature
    map then correlating equals correlating (one MXU matmul per source row)
    then sampling the scalar volume rows with the interpolation matrices.
    On TPU the per-pixel volume rows [P, H2, W2] are the same size as the
    sampled-feature intermediate, so this costs no extra memory vs the
    reference's shared-memory tiling and stays entirely on the MXU.
    """
    E, H1, W1, C = f1.shape
    H2, W2 = f2.shape[1:3]
    rd = 2 * radius + 1
    P = H1 * W1
    v = jnp.einsum(
        "epc,ehwc->ephw",
        f1.reshape(E, P, C).astype(jnp.float32),
        f2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / 16.0
    Wy, Wx = _interp_matrices(coords.reshape(E, P, 2), H2, W2, radius)
    tmp = jnp.einsum("epbh,ephw->epbw", Wy, v)
    out = jnp.einsum("epbw,epaw->epab", tmp, Wx)
    return out.reshape(E, H1, W1, rd * rd)


def altcorr_pyramid(f1, f2_pyramid, coords, radius=3):
    """Fused lookup over a feature pyramid (reference AltCorrBlock semantics).

    f1: [E, H, W, C] level-0 source features; f2_pyramid: list of
    [E, H/2^l, W/2^l, C] target features.  Returns [E, H, W, L*(2r+1)**2].

    Note: reference AltCorrBlock pre-scales fmaps by 1/4 once (corr.py:97);
    here altcorr applies 1/4 to each operand, same net 1/16.
    """
    out = []
    for lvl, f2 in enumerate(f2_pyramid):
        out.append(altcorr(f1, f2, coords / (2.0 ** lvl), radius))
    return jnp.concatenate(out, axis=-1)
