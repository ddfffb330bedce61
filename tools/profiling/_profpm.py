"""Time the P-major lookup at EuRoC scale on TPU."""
import time
import numpy as np, jax, jax.numpy as jnp
from droid_slam_reserch_tpu.ops.corr import (
    build_pyramid_pmajor, corr_lookup_pmajor,
    build_pyramid_flat, corr_volume_flat, corr_lookup_pyramid_flat,
)
E, H2, W2 = 48, 40, 64
P = H2 * W2
fdt = jnp.bfloat16
key = jax.random.PRNGKey(0)
f1 = (0.1 * jax.random.normal(key, (E, H2, W2, 128))).astype(fdt)
f2 = (0.1 * jax.random.normal(key, (E, H2, W2, 128))).astype(fdt)

def fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[0].ravel()[:1])

def timeit(name, f, *args, reps=8):
    out = f(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fetch(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms", flush=True)
    return out

build = jax.jit(lambda a, b: build_pyramid_pmajor(a, b, 4, dtype=fdt)[0])
padded = timeit("build+pad P-major pyramid", build, f1, f2)
_, meta = build_pyramid_pmajor(f1[:1, :2, :2], f2[:1], 4)  # meta only
meta = ((H2, W2), (H2//2, W2//2), (H2//4, W2//4), (H2//8, W2//8))
padded = tuple(padded)

gx, gy = jnp.meshgrid(jnp.arange(W2, dtype=jnp.float32),
                      jnp.arange(H2, dtype=jnp.float32), indexing="xy")
coords = (jnp.stack([gx, gy], -1).reshape(1, P, 2)
          + jax.random.uniform(key, (E, P, 2), minval=-2., maxval=2.))

look = jax.jit(lambda pd, c: corr_lookup_pmajor(list(pd), meta, c))
out = timeit("P-major lookup (full resolve)", look, padded, coords)
print("out", out.shape, out.dtype)

# compare against old path for honesty on same data
fb = jax.jit(lambda a, b: tuple(build_pyramid_flat(corr_volume_flat(a, b, dtype=fdt), 4)))(f1, f2)
out2 = timeit("flat one-hot lookup (old)", jax.jit(
    lambda p, c: corr_lookup_pyramid_flat(list(p), c)), tuple(fb), coords)
err = jnp.max(jnp.abs(out.astype(jnp.float32) - out2.astype(jnp.float32)))
print("max err pmajor vs flat (bf16):", float(np.asarray(err)))
