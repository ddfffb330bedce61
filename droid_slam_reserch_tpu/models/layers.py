"""Shared layer utilities: gradient clipping, instance norm, torch-style convs."""
import jax
import jax.numpy as jnp
import flax.linen as nn

GRAD_CLIP = 0.01


@jax.custom_vjp
def gradient_clip(x):
    """Identity forward; backward zeroes grads with |g| > 0.01 or NaN
    (reference modules/clipping.py:7-24)."""
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    o = jnp.zeros_like(g)
    g = jnp.where(jnp.abs(g) > GRAD_CLIP, o, g)
    g = jnp.where(jnp.isnan(g), o, g)
    return (g,)


gradient_clip.defvjp(_gc_fwd, _gc_bwd)


def instance_norm(x, eps=1e-5):
    """InstanceNorm2d, affine=False (torch default): per-sample, per-channel
    normalization over spatial dims.  x: [B, H, W, C]."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def tconv(features, kernel=3, stride=1, padding=None, name=None, dtype=None):
    """nn.Conv with torch-style explicit symmetric padding.

    Torch pads symmetrically; XLA's SAME pads asymmetrically for even sizes
    with stride 2 — explicit padding keeps outputs identical for weight
    conversion parity.
    """
    pad = kernel // 2 if padding is None else padding
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dtype=dtype,
        name=name,
    )
