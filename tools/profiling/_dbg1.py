import time, sys
t0=time.time()
import jax, jax.numpy as jnp
print("import", time.time()-t0, flush=True)
from droid_slam_reserch_tpu.ops.corr import build_pyramid_flat, corr_volume_flat, corr_lookup_pyramid_flat
E, P, H2, W2 = 48, 2560, 40, 64
fdt = jnp.bfloat16
key = jax.random.PRNGKey(0)
f1 = (0.1 * jax.random.normal(key, (E, P, 128))).astype(fdt)
f2 = (0.1 * jax.random.normal(key, (E, H2, W2, 128))).astype(fdt)
print("made inputs", time.time()-t0, flush=True)
vol = jax.jit(lambda a, b: build_pyramid_flat(corr_volume_flat(a.reshape(E,H2,W2,128), b, dtype=fdt), 4))(f1, f2)
jax.block_until_ready(vol)
print("vol built", time.time()-t0, flush=True)
kx = jax.random.uniform(key, (E, P, 2)) * jnp.array([W2-1.0, H2-1.0])
jax.block_until_ready(kx)
print("coords", time.time()-t0, flush=True)
out = jax.jit(lambda c: corr_lookup_pyramid_flat(vol, c))(kx)
jax.block_until_ready(out)
print("single lookup done", time.time()-t0, flush=True)
