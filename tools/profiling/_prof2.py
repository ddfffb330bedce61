"""Profile components with in-graph loops (amortize dispatch/tunnel RTT)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from droid_slam_reserch_tpu.ba.solver import ba_iterations, schur_pairs
from droid_slam_reserch_tpu.engine.net_ops import make_applies
from droid_slam_reserch_tpu.engine.droid import init_params
from droid_slam_reserch_tpu.utils import DroidConfig
from droid_slam_reserch_tpu.lie import se3_exp
from droid_slam_reserch_tpu.geom import projective_transform, coords_grid
from droid_slam_reserch_tpu.ops.corr import (
    build_pyramid_flat, corr_lookup_pyramid_flat, corr_volume_flat,
)

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
fmaps = (0.1 * jax.random.normal(key, (MW, 1, h8, w8, 128))).astype(fdt)

rng = np.random.RandomState(0)
ii = np.concatenate([np.arange(MW - 1), rng.randint(0, MW - 1, N - (MW - 1))]).astype(np.int32)
jj = np.clip(ii + rng.randint(1, 4, N), 0, MW - 1).astype(np.int32)
jj = np.where(jj == ii, np.clip(ii + 1, 0, MW - 1), jj)
iid, jjd = jnp.asarray(ii), jnp.asarray(jj)
kk = iid
fmap1_e = fmaps[iid, 0]
fmap2_e = fmaps[jjd, 0]

be, bm = schur_pairs(ii, MW)
be, bm = jnp.asarray(be), jnp.asarray(bm)
free = jnp.arange(MW) >= 1
target = jnp.zeros((N, h8, w8, 2))
weight = 0.5 * jnp.ones((N, h8, w8, 2))
eta = 1e-4 * jnp.ones((MW, h8, w8))
dsens = jnp.zeros((MW, h8, w8))
nets_e = jnp.zeros((N, h8, w8, 128), fdt)
inps_e = jnp.zeros((N, h8, w8, 128), fdt)

K = 10  # in-graph repeats


def timeit(name, f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (n * K) * 1e3
    print(f"{name:40s} {dt:8.3f} ms")
    return dt


# dispatch overhead probe: trivial op
@jax.jit
def nop(x):
    return x + 1.0

x = jnp.ones((8, 128))
jax.block_until_ready(nop(x))
t0 = time.perf_counter()
for _ in range(50):
    x = nop(x)
jax.block_until_ready(x)
print(f"{'dispatch overhead (trivial op)':40s} {(time.perf_counter()-t0)/50*1e3:8.3f} ms")


@jax.jit
def vol_pyr_k(f1, f2):
    def body(i, acc):
        vol = corr_volume_flat(f1 + acc, f2, dtype=fdt)
        pyr = build_pyramid_flat(vol, num_levels=4)
        return acc + pyr[0][0, 0, 0, 0].astype(jnp.float32) * 0
    return jax.lax.fori_loop(0, K, body, 0.0)

timeit("volume+pyramid", vol_pyr_k, fmap1_e, fmap2_e)


@jax.jit
def reproj_k(poses, disps):
    def body(i, acc):
        c1, _ = projective_transform((poses + acc)[None], disps[None], intr_win[None], iid, jjd)
        return acc + c1[0, 0, 0, 0, 0] * 0
    return jax.lax.fori_loop(0, K, body, 0.0)

timeit("reproject", reproj_k, poses, disps)


pyr = jax.jit(lambda f1, f2: build_pyramid_flat(corr_volume_flat(f1, f2, dtype=fdt), 4))(fmap1_e, fmap2_e)
coords1 = jax.jit(lambda p, d: projective_transform(p[None], d[None], intr_win[None], iid, jjd)[0][0])(poses, disps)


@jax.jit
def lookup_k(pyr, coords1):
    def body(i, acc):
        c = corr_lookup_pyramid_flat(pyr, (coords1 + acc).reshape(N, h8 * w8, 2))
        return acc + c[0, 0, 0].astype(jnp.float32) * 0
    return jax.lax.fori_loop(0, K, body, 0.0)

timeit("corr lookup (4 lvls)", lookup_k, pyr, coords1)


corr = jax.jit(lambda pyr, c: corr_lookup_pyramid_flat(pyr, c.reshape(N, h8*w8, 2)).reshape(N, h8, w8, -1))(pyr, coords1)
c0 = coords_grid(h8, w8)


@jax.jit
def upd_k(nets_e, corr, coords1, target):
    def body(i, carry):
        nets, acc = carry
        motn = jnp.clip(jnp.concatenate([coords1 - c0 + acc, target - coords1], axis=-1), -64., 64.)
        net, delta, w, e, u = applies["update"](params, nets[None], inps_e[None],
                                                corr[None].astype(fdt), motn[None].astype(fdt), kk, MW)
        return net[0], acc + delta.astype(jnp.float32).sum() * 0
    return jax.lax.fori_loop(0, K, body, (nets_e, 0.0))

timeit("update module", upd_k, nets_e, corr, coords1, target)


@jax.jit
def ba_k(poses, disps, target, weight):
    def body(i, st):
        p, d = st
        return ba_iterations(p, d, intr, dsens, target, weight, eta,
                             iid, jjd, free, be, bm, iterations=2, lm=1e-4, ep=0.1)
    return jax.lax.fori_loop(0, K, body, (poses, disps))

timeit("BA (2 GN iters)", ba_k, poses, disps, target, weight)
