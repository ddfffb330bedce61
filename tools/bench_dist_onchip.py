"""On-chip executions of the TPU-designated distributed paths.

Everything here had only ever run on the virtual CPU mesh (DIST_SCALING.json);
this script proves the TPU code paths compile and are numerically sane on the
actual TPU platform:

1. ``dist_ba_solve`` on a 1-device TPU mesh with BOTH exchange strategies —
   ``dense_psum`` is what ``resolve_exchange`` auto-selects on TPU meshes
   (parallel/dist_ba.py:128-134) from microbenches alone; this runs it.
   Parity is checked against the engine's single-device ``ba_solve``
   (reference seam: the CUDA BA dispatch, droid_kernels.cu:1244-1272).
2. The sharded ``_lowmem_refresh`` shard_map program on a 1-device TPU mesh
   (engine/factor_graph.py:355), vs the plain fused refresh.

Writes/merges results under the "onchip" key of DIST_SCALING.json and prints
one JSON line.  Run on the TPU (default axon platform): python
tools/bench_dist_onchip.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from droid_slam_reserch_tpu.ba.solver import ba_solve, schur_pairs
    from droid_slam_reserch_tpu.lie import se3_exp
    from droid_slam_reserch_tpu.parallel.dist_ba import (dist_ba_solve,
                                                         partition_edges)

    platform = jax.devices()[0].platform
    out = {"platform": platform, "device": str(jax.devices()[0])}

    MW, h8, w8 = 512, 30, 40
    key = jax.random.PRNGKey(0)
    poses = se3_exp(0.01 * jax.random.normal(key, (MW, 6)))
    disps = jnp.ones((MW, h8, w8))
    intr = jnp.array([w8 * 4.0, w8 * 4.0, w8 / 2.0, h8 / 2.0])
    dsens = jnp.zeros((MW, h8, w8))
    eta = 1e-4 * jnp.ones((MW, h8, w8))
    free = jnp.arange(MW) >= 1

    from tools.bench_dist_ba import proximity_graph  # same graph shape

    ii, jj = proximity_graph(MW, rad=4)
    from droid_slam_reserch_tpu.geom import projective_transform

    intrT = jnp.broadcast_to(intr, (MW, 4))
    coords, _ = projective_transform(
        poses[None], disps[None], intrT[None], jnp.asarray(ii), jnp.asarray(jj)
    )
    target = np.asarray(coords[0]) + 0.2 * np.random.RandomState(0).standard_normal(
        (len(ii), h8, w8, 2)
    ).astype(np.float32)
    weight = 0.5 * np.ones((len(ii), h8, w8, 2), np.float32)

    iters, reps = 2, 3

    # ---- single-device engine reference --------------------------------
    be, bm = schur_pairs(ii, MW)
    args = (poses, disps, intr, dsens, jnp.asarray(target), jnp.asarray(weight),
            eta, jnp.asarray(ii), jnp.asarray(jj), free,
            jnp.asarray(be), jnp.asarray(bm))
    p, _ = ba_solve(*args, iterations=iters, lm=1e-5, ep=1e-2)
    np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(reps):
        p, _ = ba_solve(*args, iterations=iters, lm=1e-5, ep=1e-2)
    np.asarray(p)
    out["ba_solve_s"] = round((time.perf_counter() - t0) / reps, 4)

    # ---- dist_ba_solve, 1-shard TPU mesh, both exchanges ----------------
    mesh = Mesh(np.array(jax.devices()[:1]), ("kf",))
    ii_s, jj_s, tgt_s, wgt_s, be_s, bm_s, k0_s, rlen_s = partition_edges(
        ii, jj, target, weight, MW, 1
    )
    for exchange in ("dense_psum", "gather_root"):
        def solve():
            return dist_ba_solve(
                mesh, poses, disps, intr, dsens,
                jnp.asarray(tgt_s), jnp.asarray(wgt_s), eta,
                jnp.asarray(ii_s), jnp.asarray(jj_s), free,
                jnp.asarray(be_s), jnp.asarray(bm_s),
                jnp.asarray(k0_s), jnp.asarray(rlen_s),
                iterations=iters, lm=1e-5, ep=1e-2, exchange=exchange,
            )

        t0 = time.perf_counter()
        p2, _ = solve()
        np.asarray(p2)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            p2, _ = solve()
        np.asarray(p2)
        dt = (time.perf_counter() - t0) / reps
        out[f"dist_ba_{exchange}"] = {
            "s_per_solve": round(dt, 4),
            "compile_s": round(compile_s, 1),
            "max_pose_err_vs_ba_solve": float(
                np.abs(np.asarray(p2) - np.asarray(p)).max()),
        }

    # ---- sharded _lowmem_refresh shard_map program on the chip ----------
    import droid_slam_reserch_tpu.engine.factor_graph as fgmod
    from droid_slam_reserch_tpu.engine.factor_graph import FactorGraph
    from droid_slam_reserch_tpu.engine.net_ops import make_applies
    from droid_slam_reserch_tpu.engine.droid import init_params
    from droid_slam_reserch_tpu.engine.video import Video
    from droid_slam_reserch_tpu.utils import DroidConfig

    dtype_str = "bfloat16" if platform != "cpu" else "float32"
    fdt = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    T = 256
    cfgT = DroidConfig(image_size=(h8 * 8, w8 * 8), buffer=T + 24,
                       compute_dtype=dtype_str)
    params = init_params(cfgT.replace(image_size=(64, 64)), seed=0)
    applies = make_applies(dtype_str)

    def build_graph():
        video = Video(cfgT)
        video.counter = T
        video.poses = video.poses.at[:T].set(
            se3_exp(0.01 * jax.random.normal(key, (T, 6))))
        video.disps = video.disps.at[:T].set(jnp.ones((T, h8, w8)))
        video.intrinsics = video.intrinsics.at[:T].set(
            jnp.broadcast_to(intr, (T, 4)))
        video.fmaps = video.fmaps.at[:T].set(
            (0.1 * jax.random.normal(key, (T, 1, h8, w8, 128))).astype(fdt))
        video.inps = video.inps.at[:T].set(jnp.zeros((T, h8, w8, 128), fdt))
        iiT = np.concatenate([np.arange(T - 1), np.arange(T - 2)]).astype(np.int64)
        jjT = np.concatenate([np.arange(1, T), np.arange(2, T)]).astype(np.int64)
        g = FactorGraph(video, applies["update"], params, dtype=fdt)
        g.ii, g.jj = iiT, jjT
        g.age = np.zeros(len(iiT), np.int64)
        g.net = jnp.zeros((len(iiT), h8, w8, 128), fdt)
        g.target = jnp.zeros((len(iiT), h8, w8, 2))
        g.weight = jnp.zeros((len(iiT), h8, w8, 2))
        return video, g

    for mode in ("plain", "sharded"):
        video, g = build_graph()
        if mode == "sharded":
            # route the refresh through the shard_map program on a 1-device
            # mesh — the exact TPU multi-chip code path, minus the ICI hops
            mesh1 = g._refresh_mesh(1)
            orig = fgmod._lowmem_refresh

            def via_shard_map(update_apply, params_, *a, **kw):
                return fgmod._lowmem_refresh_sharded(
                    mesh1, update_apply, params_, *a, **kw)

            fgmod._lowmem_refresh = via_shard_map
        try:
            g.update_lowmem(steps=1, itrs=2)       # compile
            np.asarray(video.poses)[0]
            t0 = time.perf_counter()
            g.update_lowmem(steps=1, itrs=2)
            np.asarray(video.poses)[0]
            out[f"lowmem_refresh_{mode}_s"] = round(time.perf_counter() - t0, 4)
            out[f"lowmem_refresh_{mode}_poses_finite"] = bool(
                np.isfinite(np.asarray(video.poses[:T])).all())
        finally:
            if mode == "sharded":
                fgmod._lowmem_refresh = orig

    # merge into DIST_SCALING.json
    path = os.path.join(os.path.dirname(__file__), "..", "DIST_SCALING.json")
    try:
        with open(path) as f:
            data = json.load(f)
    except Exception:
        data = {}
    data["onchip"] = out
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
