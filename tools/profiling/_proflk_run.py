"""Benchmark corr-lookup variants honestly (full output consumed via tanh+sum,
coords vary per in-graph iteration so nothing hoists)."""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from droid_slam_reserch_tpu.ops.corr import (
    build_pyramid_flat, corr_volume_flat, corr_lookup_pyramid_flat,
)

E, P = 48, 40 * 64
H2, W2 = 40, 64
fdt = jnp.bfloat16
key = jax.random.PRNGKey(0)
f1 = (0.1 * jax.random.normal(key, (E, P, 128))).astype(fdt)
f2 = (0.1 * jax.random.normal(key, (E, H2, W2, 128))).astype(fdt)
vol = jax.jit(lambda a, b: build_pyramid_flat(corr_volume_flat(
    a.reshape(E, H2, W2, 128), b, dtype=fdt), 4))(f1, f2)
vol = jax.block_until_ready(vol)
kx = jax.random.uniform(key, (E, P, 2)) * jnp.array([W2 - 1.0, H2 - 1.0])
K = 8
RD = 7
R = 3


def timeit(name, fn, *args, reps=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (reps * K) * 1e3
    print(f"{name:46s} {dt:8.3f} ms/lookup")
    return dt


def loop(body):
    @jax.jit
    def run(vols, coords):
        def it(i, acc):
            c = coords + acc * 1e-20 + i * 1e-6
            out = body(vols, c)
            return acc + jnp.sum(jnp.tanh(out.astype(jnp.float32)))
        return jax.lax.fori_loop(0, K, it, 0.0)
    return run


# V1: current per-level one-hot einsum
v1 = loop(lambda vols, c: corr_lookup_pyramid_flat(vols, c))

# V2: y via take_along_axis (8 rows), blend; x via one-hot einsum
def lookup_v2_level(volp, coords):
    E_, P_, h2, w2 = volp.shape
    x0, y0 = coords[..., 0], coords[..., 1]
    xf = jnp.floor(x0); yf = jnp.floor(y0)
    dx = (x0 - xf); dy = (y0 - yf)
    yc = yf.astype(jnp.int32)
    # gather rows yc-3 .. yc+4 (8 rows) along axis=-2
    k = jnp.arange(8, dtype=jnp.int32) - R
    rows = yc[..., None] + k                       # [E,P,8]
    ok_r = (rows >= 0) & (rows < h2)
    rows_c = jnp.clip(rows, 0, h2 - 1)
    g = jnp.take_along_axis(volp, rows_c[..., None], axis=2)  # [E,P,8,w2]
    g = jnp.where(ok_r[..., None], g, 0)
    dyb = dy[..., None, None].astype(volp.dtype)
    tmp = (1 - dyb) * g[:, :, :RD] + dyb * g[:, :, 1:]        # [E,P,7,w2]
    # x stage via one-hot matmul
    taps = jnp.arange(RD, dtype=jnp.int32) - R
    iow = jnp.arange(w2, dtype=jnp.int32)
    xc = xf.astype(jnp.int32)[..., None, None] + taps[:, None]
    dxb = dx[..., None, None]
    Wx = ((1.0 - dxb) * (iow == xc) + dxb * (iow == xc + 1)).astype(volp.dtype)
    out = jnp.einsum("epbw,epaw->epab", tmp, Wx)
    return out.reshape(E_, P_, RD * RD)


def pyr_lookup(level_fn):
    def f(vols, c):
        outs = [level_fn(v, c / (2.0 ** l)) for l, v in enumerate(vols)]
        return jnp.concatenate(outs, axis=-1)
    return f

v2 = loop(pyr_lookup(lookup_v2_level))

# V3: both stages via take_along_axis
def lookup_v3_level(volp, coords):
    E_, P_, h2, w2 = volp.shape
    x0, y0 = coords[..., 0], coords[..., 1]
    xf = jnp.floor(x0); yf = jnp.floor(y0)
    dx = (x0 - xf); dy = (y0 - yf)
    yc = yf.astype(jnp.int32); xc = xf.astype(jnp.int32)
    k = jnp.arange(8, dtype=jnp.int32) - R
    rows = yc[..., None] + k
    ok_r = (rows >= 0) & (rows < h2)
    g = jnp.take_along_axis(volp, jnp.clip(rows, 0, h2 - 1)[..., None], axis=2)
    g = jnp.where(ok_r[..., None], g, 0)                      # [E,P,8,w2]
    dyb = dy[..., None, None].astype(volp.dtype)
    tmp = (1 - dyb) * g[:, :, :RD] + dyb * g[:, :, 1:]        # [E,P,7,w2]
    cols = xc[..., None] + k                                   # [E,P,8]
    ok_c = (cols >= 0) & (cols < w2)
    cols_c = jnp.clip(cols, 0, w2 - 1)
    g2 = jnp.take_along_axis(tmp, cols_c[:, :, None, :], axis=3)  # [E,P,7,8]
    g2 = jnp.where(ok_c[:, :, None, :], g2, 0)
    dxb = dx[..., None, None].astype(volp.dtype)
    out = (1 - dxb) * g2[..., :RD] + dxb * g2[..., 1:]        # [E,P,7(y),7(x)]
    # reference channel order a*(rd)+b with a = x tap: transpose
    return out.transpose(0, 1, 3, 2).reshape(E_, P_, RD * RD)

v3 = loop(pyr_lookup(lookup_v3_level))

# V4: flat 64-tap take_along over last dim [E,P,h2*w2]
def lookup_v4_level(volp, coords):
    E_, P_, h2, w2 = volp.shape
    vf = volp.reshape(E_, P_, h2 * w2)
    x0, y0 = coords[..., 0], coords[..., 1]
    xf = jnp.floor(x0); yf = jnp.floor(y0)
    dx = (x0 - xf)[..., None, None]; dy = (y0 - yf)[..., None, None]
    yc = yf.astype(jnp.int32); xc = xf.astype(jnp.int32)
    k = jnp.arange(8, dtype=jnp.int32) - R
    rows = yc[..., None, None] + k[:, None]
    cols = xc[..., None, None] + k[None, :]
    ok = (rows >= 0) & (rows < h2) & (cols >= 0) & (cols < w2)
    idx = jnp.clip(rows, 0, h2 - 1) * w2 + jnp.clip(cols, 0, w2 - 1)
    g = jnp.take_along_axis(vf, idx.reshape(E_, P_, 64), axis=2)
    g = jnp.where(ok.reshape(E_, P_, 64), g, 0).reshape(E_, P_, 8, 8)
    tmp = (1 - dy.astype(volp.dtype)) * g[:, :, :RD] + dy.astype(volp.dtype) * g[:, :, 1:]
    out = (1 - dx.astype(volp.dtype)) * tmp[..., :RD] + dx.astype(volp.dtype) * tmp[..., 1:]
    return out.transpose(0, 1, 3, 2).reshape(E_, P_, RD * RD)

v4 = loop(pyr_lookup(lookup_v4_level))


import sys, time
sel = sys.argv[1]
import jax
vol = tuple(vol)

bodies = {"v1": ("V1 one-hot einsum (current)", lambda vols, c: corr_lookup_pyramid_flat(vols, c)),
          "v2": ("V2 y-gather + x one-hot", pyr_lookup(lookup_v2_level)),
          "v3": ("V3 y-gather + x-gather", pyr_lookup(lookup_v3_level)),
          "v4": ("V4 flat 64-tap gather", pyr_lookup(lookup_v4_level))}
name, body = bodies[sel]
f = jax.jit(body)
t0 = time.perf_counter()
out = f(vol, kx); jax.block_until_ready(out)
print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
print("out shape", out.shape, "mean", float(out.astype(jnp.float32).mean()))
reps = 4
t0 = time.perf_counter()
for _ in range(reps):
    out = f(vol, kx)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / reps * 1e3
print(f"{name:46s} {dt:8.3f} ms/lookup", flush=True)
# parity vs v1
ref = jax.jit(bodies["v1"][1])(vol, kx)
err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
print("max err vs V1:", float(err))
