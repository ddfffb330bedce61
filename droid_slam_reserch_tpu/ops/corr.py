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


def corr_volume(f1, f2):
    """All-pairs correlation volume (reference modules/corr.py:63-71).

    f1: [E, H1, W1, C], f2: [E, H2, W2, C] -> [E, H1, W1, H2, W2], scaled 1/16.
    """
    E, H1, W1, C = f1.shape
    H2, W2 = f2.shape[1:3]
    v = jnp.einsum(
        "exyc,euvc->exyuv",
        f1.astype(jnp.float32),
        f2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return v / 16.0


def pool2x_volume(vol):
    """2x average pool over the last two (target) dims of [E,H1,W1,H2,W2].

    Odd trailing rows/cols are dropped (torch avg_pool2d floor semantics).
    """
    E, H1, W1, H2, W2 = vol.shape
    h, w = H2 // 2, W2 // 2
    v = vol[..., : 2 * h, : 2 * w].reshape(E, H1, W1, h, 2, w, 2)
    return v.mean(axis=(4, 6))


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


def _blend(P, dx, dy, rd):
    """Bilinearly blend integer-offset patch correlations.

    P: [E, rd+1, rd+1, H, W] patch values at integer offsets (u, v) =
    (x, y) offsets from floor(coords) - r.  Output [E, H, W, rd*rd] with the
    reference channel order a*rd + b (a = x offset, b = y offset).
    """
    w00 = (1.0 - dx) * (1.0 - dy)
    w10 = dx * (1.0 - dy)
    w01 = (1.0 - dx) * dy
    w11 = dx * dy
    out = (
        P[:, :rd, :rd] * w00[:, None, None]
        + P[:, 1:, :rd] * w10[:, None, None]
        + P[:, :rd, 1:] * w01[:, None, None]
        + P[:, 1:, 1:] * w11[:, None, None]
    )  # [E, rd, rd, H, W]
    E, _, _, H, W = out.shape
    return out.reshape(E, rd * rd, H, W).transpose(0, 2, 3, 1)


def corr_lookup(vol, coords, radius=3):
    """Indexed bilinear lookup into a correlation volume.

    vol: [E, H1, W1, H2, W2]; coords: [E, H1, W1, 2] (x, y) in level pixels.
    Returns [E, H1, W1, (2r+1)**2].  Mirrors corr_index_forward
    (correlation_kernels.cu:19-70); differentiable through the gathers.
    """
    E, H1, W1, H2, W2 = vol.shape
    rd = 2 * radius + 1
    xf, yf, dx, dy = _patch_weights(coords)
    flat = vol.reshape(E, H1, W1, H2 * W2)

    patches = []
    for u in range(rd + 1):
        row = []
        for v in range(rd + 1):
            x1 = xf - radius + u
            y1 = yf - radius + v
            ok = (x1 >= 0) & (x1 < W2) & (y1 >= 0) & (y1 < H2)
            idx = jnp.clip(y1, 0, H2 - 1) * W2 + jnp.clip(x1, 0, W2 - 1)
            s = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
            row.append(jnp.where(ok, s, 0.0))
        patches.append(jnp.stack(row, axis=1))
    P = jnp.stack(patches, axis=1)  # [E, rd+1, rd+1, H1, W1]
    return _blend(P, dx, dy, rd)


def corr_lookup_pyramid(pyramid, coords, radius=3):
    """Lookup at every pyramid level, concatenated (reference corr.py:40-50).

    Returns [E, H, W, L*(2r+1)**2], level-major channel order.
    """
    out = []
    for lvl, vol in enumerate(pyramid):
        out.append(corr_lookup(vol, coords / (2.0 ** lvl), radius))
    return jnp.concatenate(out, axis=-1)


def altcorr(f1, f2, coords, radius=3):
    """Fused on-the-fly correlation lookup (reference altcorr_kernel.cu:27-149).

    f1: [E, H1, W1, C] source features (level 0); f2: [E, H2, W2, C] target
    features at this pyramid level; coords: [E, H1, W1, 2] in level pixels.
    Returns [E, H1, W1, (2r+1)**2], scaled 1/16 — numerically identical to
    corr_lookup(corr_volume(f1, f2), coords) but O(E*HW*C) memory.

    The dot product is linear in the bilinear taps, so we correlate at the
    (rd+1)^2 integer offsets (one batched matmul each) and bilinearly blend
    the scalar results.
    """
    E, H1, W1, C = f1.shape
    H2, W2 = f2.shape[1:3]
    rd = 2 * radius + 1
    xf, yf, dx, dy = _patch_weights(coords)
    f1 = f1.astype(jnp.float32) / 4.0
    f2 = f2.astype(jnp.float32) / 4.0
    f2_flat = f2.reshape(E, H2 * W2, C)

    patches = []
    for u in range(rd + 1):
        row = []
        for v in range(rd + 1):
            x1 = xf - radius + u
            y1 = yf - radius + v
            ok = (x1 >= 0) & (x1 < W2) & (y1 >= 0) & (y1 < H2)
            idx = jnp.clip(y1, 0, H2 - 1) * W2 + jnp.clip(x1, 0, W2 - 1)
            g = jnp.take_along_axis(
                f2_flat, idx.reshape(E, -1, 1), axis=1
            ).reshape(E, H1, W1, C)
            s = jnp.einsum("ehwc,ehwc->ehw", f1, g, preferred_element_type=jnp.float32)
            row.append(jnp.where(ok, s, 0.0))
        patches.append(jnp.stack(row, axis=1))
    P = jnp.stack(patches, axis=1)  # [E, rd+1, rd+1, H1, W1]
    return _blend(P, dx, dy, rd)


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
