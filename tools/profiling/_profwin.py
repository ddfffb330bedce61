"""Time window extraction, window lookup, drift check, cond overhead on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from droid_slam_reserch_tpu.ops.corr import (
    build_pyramid_flat, corr_volume_flat, corr_lookup_pyramid_flat,
    pad_pyramid_flat, window_bases, extract_windows, corr_lookup_windows,
    window_drift_ok,
)

E, P, H2, W2 = 48, 2560, 40, 64
fdt = jnp.bfloat16
key = jax.random.PRNGKey(0)
f1 = (0.1 * jax.random.normal(key, (E, H2, W2, 128))).astype(fdt)
f2 = (0.1 * jax.random.normal(key, (E, H2, W2, 128))).astype(fdt)


def timeit(name, f, *args, reps=8):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms", flush=True)
    return out


pyr = timeit("volume+pyramid", jax.jit(lambda a, b: tuple(build_pyramid_flat(
    corr_volume_flat(a, b, dtype=fdt), 4))), f1, f2)
padded_meta = timeit("pad pyramid", jax.jit(
    lambda p: pad_pyramid_flat(list(p))[0]), pyr)
_, meta = pad_pyramid_flat(list(pyr))
padded = tuple(padded_meta)

gx, gy = jnp.meshgrid(jnp.arange(W2, dtype=jnp.float32),
                      jnp.arange(H2, dtype=jnp.float32), indexing="xy")
coords = (jnp.stack([gx, gy], -1).reshape(1, P, 2)
          + jax.random.uniform(key, (E, P, 2), minval=-2., maxval=2.))

bases = timeit("window_bases", jax.jit(
    lambda c: window_bases(c, meta)), coords)
bases = window_bases(coords, meta)
wins = timeit("extract_windows", jax.jit(
    lambda pd, c: tuple(extract_windows(list(pd), meta, window_bases(c, meta)))),
    padded, coords)
wins = tuple(extract_windows(list(padded), meta, bases))

timeit("drift check", jax.jit(
    lambda c: window_drift_ok(c, meta, bases)), coords)
timeit("window lookup", jax.jit(
    lambda w, c: corr_lookup_windows(list(w), meta, bases, c)), wins, coords)
timeit("FULL lookup (old path)", jax.jit(
    lambda p, c: corr_lookup_pyramid_flat(list(p), c)), pyr, coords)


# cond overhead: window vs cond(window, full)
@jax.jit
def with_cond(w, p, c):
    return jax.lax.cond(
        window_drift_ok(c, meta, bases),
        lambda cc: corr_lookup_windows(list(w), meta, bases, cc),
        lambda cc: corr_lookup_pyramid_flat(list(p), cc),
        c)

timeit("cond(window|full) taken=window", with_cond, wins, pyr, coords)
