"""Ablation profile of the fused frontend program: knock out pieces of
round_body and time the full 6-round program each time."""
import time
from functools import partial

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
ROUNDS = 6
fdt = jnp.bfloat16
cfg = DroidConfig(image_size=(h8 * 8, w8 * 8), buffer=MW, compute_dtype="bfloat16")
params = init_params(cfg.replace(image_size=(64, 64)), seed=0)
apply_fn = make_applies("bfloat16")["update"]

key = jax.random.PRNGKey(0)
poses0 = se3_exp(0.03 * jax.random.normal(key, (MW, 6)))
disps0 = jnp.ones((MW, h8, w8))
intr = jnp.array([w8 * 4.0, w8 * 4.0, w8 / 2.0, h8 / 2.0])
intr_win = jnp.broadcast_to(intr, (MW, 4))
fmaps = (0.1 * jax.random.normal(key, (MW, 1, h8, w8, 128))).astype(fdt)

rng = np.random.RandomState(0)
ii = np.concatenate([np.arange(MW - 1), rng.randint(0, MW - 1, N - (MW - 1))]).astype(np.int32)
jj = np.clip(ii + rng.randint(1, 4, N), 0, MW - 1).astype(np.int32)
jj = np.where(jj == ii, np.clip(ii + 1, 0, MW - 1), jj)
iid, jjd = jnp.asarray(ii), jnp.asarray(jj)
kk_a = iid
fmap1_e = fmaps[iid, 0]
fmap2_e = fmaps[jjd, 0]

be, bm = schur_pairs(ii, MW)
be, bm = jnp.asarray(be), jnp.asarray(bm)
free = jnp.arange(MW) >= 1
target0 = jnp.zeros((N, h8, w8, 2))
eta_eps = 1e-7
dsens = jnp.zeros((MW, h8, w8))
nets0 = jnp.zeros((N, h8, w8, 128), fdt)
inps_e = jnp.zeros((N, h8, w8, 128), fdt)
damping0 = 1e-6 * jnp.ones((MW, h8, w8))
has_edge = jnp.zeros(MW, bool).at[iid].set(True)
coords0 = coords_grid(h8, w8)


@partial(jax.jit, static_argnames=("do_reproj", "do_corr", "do_update", "do_ba"))
def fused(poses_win, disps_win, damping_win, nets_e, target_a,
          do_reproj=True, do_corr=True, do_update=True, do_ba=True):
    E = fmap1_e.shape[0]
    vol = corr_volume_flat(fmap1_e, fmap2_e, dtype=fdt)
    pyr = build_pyramid_flat(vol, num_levels=4)

    def round_body(_, st):
        poses, disps, damping, nets, target_a, wprev = st
        if do_reproj:
            coords1, _ = projective_transform(
                poses[None], disps[None], intr_win[None], iid, jjd)
            coords1 = coords1[0]
        else:
            coords1 = jnp.broadcast_to(coords0, (N, h8, w8, 2)) + target_a * 0
        motn = jnp.clip(
            jnp.concatenate([coords1 - coords0, target_a - coords1], axis=-1),
            -64.0, 64.0)
        if do_corr:
            corr = corr_lookup_pyramid_flat(
                pyr, coords1.reshape(E, h8 * w8, 2)).reshape(E, h8, w8, -1)
        else:
            corr = jnp.zeros((E, h8, w8, 196), fdt) + coords1[..., :1].astype(fdt) * 0
        if do_update:
            nets, delta, weight, eta, _ = apply_fn(
                params, nets[None], inps_e[None], corr[None].astype(fdt),
                motn[None].astype(fdt), kk_a, MW)
            nets = nets[0]
            delta0 = delta[0].astype(jnp.float32)
            weight_a = weight[0].astype(jnp.float32)
            eta0 = eta[0].astype(jnp.float32)
        else:
            delta0 = corr[..., :2].astype(jnp.float32) * 1e-6 + motn[..., :2] * 1e-6
            weight_a = 0.5 * jnp.ones((N, h8, w8, 2)) + delta0 * 0
            eta0 = 1e-4 * jnp.ones((MW, h8, w8))
            nets = nets + delta0[..., :1].astype(fdt) * 0
        target_a = coords1 + delta0
        damping = jnp.where(has_edge[:, None, None], eta0, damping)
        eta_ba = 0.2 * damping + eta_eps
        if do_ba:
            poses, disps = ba_iterations(
                poses, disps, intr, dsens, target_a, weight_a, eta_ba,
                iid, jjd, free, be, bm, iterations=2, lm=1e-4, ep=0.1)
            disps = jnp.maximum(disps, 0.001)
        else:
            poses = poses + target_a[0, 0, 0, 0] * 1e-9
            disps = jnp.maximum(disps + weight_a[0, 0, 0, 0] * 1e-9, 0.001)
        return poses, disps, damping, nets, target_a, weight_a

    w0 = jnp.zeros_like(target_a)
    return jax.lax.fori_loop(0, ROUNDS, round_body,
                             (poses_win, disps_win, damping_win, nets_e, target_a, w0))


def run(name, **kw):
    st = fused(poses0, disps0, damping0, nets0, target0, **kw)
    jax.block_until_ready(st[0])
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        st = fused(*st[:5], **kw)
    jax.block_until_ready(st[0])
    dt = (time.perf_counter() - t0) / (reps * ROUNDS) * 1e3
    print(f"{name:44s} {dt:8.3f} ms/round")
    return dt


full = run("full")
run("no BA", do_ba=False)
run("no update", do_update=False)
run("no corr lookup", do_corr=False)
run("no reproject", do_reproj=False)
run("corr+update only", do_reproj=False, do_ba=False)
run("BA only", do_corr=False, do_update=False, do_reproj=False)
