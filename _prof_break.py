"""Component breakdown of one frontend update iteration at bench shapes."""
import os, time
import numpy as np

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from droid_slam_reserch_tpu.ops.corr import (
    corr_volume_flat, build_pyramid_flat, corr_lookup_pyramid_flat)
from droid_slam_reserch_tpu.ba.solver import ba_iterations, schur_pairs
from droid_slam_reserch_tpu.engine.net_ops import make_applies
from droid_slam_reserch_tpu.engine.droid import init_params
from droid_slam_reserch_tpu.utils import DroidConfig
from droid_slam_reserch_tpu.lie import se3_exp
from droid_slam_reserch_tpu.geom import projective_transform, coords_grid

h8, w8, N, MW = 40, 64, 48, 24
fdt = jnp.bfloat16
cfg = DroidConfig(image_size=(h8 * 8, w8 * 8), buffer=MW, compute_dtype="bfloat16")
params = init_params(cfg.replace(image_size=(64, 64)), seed=0)
applies = make_applies("bfloat16")

key = jax.random.PRNGKey(0)
poses = se3_exp(0.03 * jax.random.normal(key, (MW, 6)))
disps = jnp.ones((MW, h8, w8))
intr = jnp.array([w8 * 4.0, w8 * 4.0, w8 / 2.0, h8 / 2.0])
intr_win = jnp.broadcast_to(intr, (MW, 4))
rng = np.random.RandomState(0)
ii = np.concatenate([np.arange(MW - 1), rng.randint(0, MW - 1, N - (MW - 1))]).astype(np.int32)
jj = np.clip(ii + rng.randint(1, 4, N), 0, MW - 1).astype(np.int32)
jj = np.where(jj == ii, np.clip(ii + 1, 0, MW - 1), jj)
iid, jjd = jnp.asarray(ii), jnp.asarray(jj)
f = (0.1 * jax.random.normal(key, (MW, h8, w8, 128))).astype(fdt)
f1, f2 = f[iid], f[jjd]

def _sync(out):
    # axon tunnel: block_until_ready is unreliable; a host readback is real
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return out


def timeit(name, fn, *args, reps=20):
    out = _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:36s} {dt:8.3f} ms", flush=True)
    return out

volf = jax.jit(lambda a, b: corr_volume_flat(a, b, dtype=fdt))
vol = timeit("corr_volume", volf, f1, f2)
pyrf = jax.jit(lambda v: tuple(build_pyramid_flat(v, 4)))
pyr = timeit("build_pyramid", pyrf, vol)
coords1, _ = jax.jit(lambda p, d, i: projective_transform(p[None], d[None], i[None], iid, jjd))(poses, disps, intr_win)
cflat = coords1[0].reshape(N, h8 * w8, 2)
lk = jax.jit(lambda p, c: corr_lookup_pyramid_flat(list(p), c))
corr = timeit("corr_lookup_pyramid", lk, pyr, cflat)

nets = jnp.zeros((N, h8, w8, 128), fdt)
inps = jnp.zeros((N, h8, w8, 128), fdt)
motn = jnp.zeros((N, h8, w8, 4), fdt)
kk = iid
upd = jax.jit(lambda n, i, c, m: applies["update"](params, n[None], i[None], c[None].astype(fdt), m[None], kk, MW))
corr4 = corr.reshape(N, h8, w8, -1)
outs = timeit("update_op (GRU+agg)", upd, nets, inps, corr4, motn)

be, bm = schur_pairs(ii, MW)
be, bm = jnp.asarray(be), jnp.asarray(bm)
free = jnp.arange(MW) >= 1
target = jnp.zeros((N, h8, w8, 2))
weight = jnp.ones((N, h8, w8, 2))
eta = 1e-4 * jnp.ones((MW, h8, w8))
dsens = jnp.zeros((MW, h8, w8))
baf = jax.jit(lambda p, d, t, w: ba_iterations(
    p, d, intr, dsens, t, w, eta, iid, jjd, free, be, bm,
    iterations=2, lm=1e-4, ep=0.1, min_depth=0.25))
timeit("ba_iterations x2", baf, poses, disps, target, weight)

projf = jax.jit(lambda p, d, i: projective_transform(p[None], d[None], i[None], iid, jjd))
timeit("projective_transform", projf, poses, disps, intr_win)
