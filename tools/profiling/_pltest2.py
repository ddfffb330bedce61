"""Probe minor-dim transpose and 3D gather shapes in Pallas on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BP = 256


def bench(name, fn, *args, reps=30):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e6
    print(f"{name}: OK {dt:.1f} us/call")


key = jax.random.PRNGKey(0)

# 1) minor transpose [BP,40,8] -> [BP,8,40]
def tr_kernel(x_ref, o_ref):
    o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)

x = jax.random.normal(key, (BP, 40, 8), jnp.float32)
f_tr = jax.jit(lambda x: pl.pallas_call(
    tr_kernel,
    out_shape=jax.ShapeDtypeStruct((BP, 8, 40), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x))
bench("transpose [256,40,8]->[256,8,40]", f_tr, x)

# 2) 3D lane gather: take_along_axis(x [BP,40,64], idx [BP,40,64], axis=2)
def g3_kernel(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=2)

x3 = jax.random.normal(key, (BP, 40, 64), jnp.float32)
i3 = jax.random.randint(key, (BP, 40, 64), 0, 64).astype(jnp.int32)
f_g3 = jax.jit(lambda x, i: pl.pallas_call(
    g3_kernel,
    out_shape=jax.ShapeDtypeStruct((BP, 40, 64), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x3, i3))
bench("3D lane gather [256,40,64]", f_g3, x3, i3)

# 3) 2D reshaped lane gather [BP*40, 64]
def g2_kernel(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

x2 = x3.reshape(BP * 40, 64)
i2 = i3.reshape(BP * 40, 64)
f_g2 = jax.jit(lambda x, i: pl.pallas_call(
    g2_kernel,
    out_shape=jax.ShapeDtypeStruct((BP * 40, 64), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x2, i2))
bench("2D lane gather [10240,64]", f_g2, x2, i2)

# 4) bf16->f32 convert + gather inside kernel
def gc_kernel(x_ref, i_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    o_ref[:] = jnp.take_along_axis(xf, i_ref[:], axis=2)

xb = x3.astype(jnp.bfloat16)
f_gc = jax.jit(lambda x, i: pl.pallas_call(
    gc_kernel,
    out_shape=jax.ShapeDtypeStruct((BP, 40, 64), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(xb, i3))
bench("bf16 conv + 3D lane gather", f_gc, xb, i3)

# 5) transpose larger [BP,64,8] -> [BP,8,64]
xt = jax.random.normal(key, (BP, 64, 8), jnp.float32)
f_tr2 = jax.jit(lambda x: pl.pallas_call(
    tr_kernel,
    out_shape=jax.ShapeDtypeStruct((BP, 8, 64), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x))
bench("transpose [256,64,8]->[256,8,64]", f_tr2, xt)
