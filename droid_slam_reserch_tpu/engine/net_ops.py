"""Shared jit-stable apply functions for the network submodules.

Module instances are created once per compute dtype (lru_cache) so the
functions passed as static jit arguments keep a stable identity and the
jit cache is shared across the motion filter, factor graphs, and filler.
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ..models.extractor import BasicEncoder
from ..models.update import UpdateModule
from ..models.droidnet import IMAGE_MEAN, IMAGE_STD


@lru_cache(maxsize=None)
def _modules(dtype_str):
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_str]
    return (
        BasicEncoder(output_dim=128, norm_fn="instance", dtype=dtype),
        BasicEncoder(output_dim=256, norm_fn="none", dtype=dtype),
        UpdateModule(dtype=dtype),
    )


def normalize_image(images):
    """[..., H, W, 3] BGR 0-255 -> normalized RGB (reference motion_filter.py:66-69)."""
    x = images[..., ::-1] / 255.0
    return (x - IMAGE_MEAN) / IMAGE_STD


@lru_cache(maxsize=None)
def make_applies(dtype_str="float32"):
    """Returns dict of jitted apply fns: fnet, cnet, update (raw, un-jitted)."""
    fnet, cnet, update = _modules(dtype_str)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_str]

    @jax.jit
    def fnet_apply(params, images):
        """images [B, H, W, 3] BGR 0-255 -> fmaps [B, H/8, W/8, 128]."""
        x = normalize_image(images).astype(dtype)
        return fnet.apply({"params": params["fnet"]}, x)

    @jax.jit
    def cnet_apply(params, images):
        """images [B, H, W, 3] -> (net tanh, inp relu), each [B, H/8, W/8, 128]."""
        x = normalize_image(images).astype(dtype)
        ctx = cnet.apply({"params": params["cnet"]}, x)
        net, inp = jnp.split(ctx, 2, axis=-1)
        return jnp.tanh(net), jax.nn.relu(inp)

    def update_apply(params, net, inp, corr, flow, kk=None, num_segments=None,
                     emask=None):
        return update.apply(
            {"params": params["update"]}, net, inp, corr, flow, kk,
            num_segments, emask,
        )

    return {"fnet": fnet_apply, "cnet": cnet_apply, "update": update_apply}
