"""Probe Mosaic dynamic_gather support + perf on real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 512, 128


def mk(axis, dtype):
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, L), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
    return run


key = jax.random.PRNGKey(0)
for dtype in (jnp.float32, jnp.bfloat16):
    x = jax.random.normal(key, (S, L)).astype(dtype)
    for axis in (0, 1):
        hi = S if axis == 0 else L
        idx = jax.random.randint(key, (S, L), 0, hi).astype(jnp.int32)
        try:
            f = mk(axis, dtype)
            out = f(x, idx)
            jax.block_until_ready(out)
            ref = jnp.take_along_axis(x, idx, axis=axis)
            err = jnp.max(jnp.abs((out - ref).astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(50):
                out = f(x, idx)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 50 * 1e6
            print(f"dtype={dtype.__name__} axis={axis}: OK err={float(err)} {dt:.1f} us/call")
        except Exception as e:
            print(f"dtype={dtype.__name__} axis={axis}: FAIL {type(e).__name__}: {str(e)[:200]}")
