"""Benchmark: frontend update iterations per second on one chip.

Measures the SLAM hot path at EuRoC scale (SURVEY.md §3.1): one fused
update-operator step (reprojection + 4-level fused correlation + ConvGRU +
graph aggregation) followed by a 2-iteration dense-BA solve over a
48-edge / 24-keyframe window at 1/8 resolution 40x64 — the exact work the
reference does per frontend iteration (reference droid_frontend.py:52,
factor_graph.py:198-241).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against 60 update-iters/s, an estimate of the CUDA
reference's frontend rate on its target GPU (~10 keyframes/s x 6
iterations; the reference publishes no numbers — BASELINE.md).
"""
import json
import os
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: repeated bench runs (and driver reruns) skip
    # the 20-40s XLA compiles
    try:
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(os.path.dirname(__file__), ".jax_cache"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    # the container's sitecustomize force-selects the axon TPU platform;
    # honor an explicit JAX_PLATFORMS request (used for CPU smoke tests)
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass

    import jax.numpy as jnp

    from droid_slam_reserch_tpu.ba.solver import ba_solve, schur_pairs
    from droid_slam_reserch_tpu.engine.net_ops import make_applies
    from droid_slam_reserch_tpu.engine.droid import init_params
    from droid_slam_reserch_tpu.utils import DroidConfig
    from droid_slam_reserch_tpu.lie import se3_exp

    small = bool(int(os.environ.get("BENCH_SMALL", "0")))
    if small:
        h8, w8, N, MW, iters = 8, 16, 16, 8, 5
    else:
        h8, w8, N, MW, iters = 40, 64, 48, 24, 20

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype_str = "bfloat16" if on_tpu else "float32"
    cfg = DroidConfig(image_size=(h8 * 8, w8 * 8), buffer=MW, compute_dtype=dtype_str)
    params = init_params(cfg.replace(image_size=(64, 64)), seed=0)
    if dtype_str == "bfloat16":
        pass  # params stay fp32; compute dtype handled by modules
    applies = make_applies(dtype_str)

    key = jax.random.PRNGKey(0)
    poses = se3_exp(0.03 * jax.random.normal(key, (MW, 6)))
    disps = jnp.ones((MW, h8, w8))
    intr = jnp.array([w8 * 4.0, w8 * 4.0, w8 / 2.0, h8 / 2.0])
    intrinsics = jnp.broadcast_to(intr, (MW, 4))
    fdt = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    fmaps = (0.1 * jax.random.normal(key, (MW, 1, h8, w8, 128))).astype(fdt)

    rng = np.random.RandomState(0)
    ii = np.concatenate([np.arange(MW - 1), rng.randint(0, MW - 1, N - (MW - 1))]).astype(np.int32)
    jj = np.clip(ii + rng.randint(1, 4, N), 0, MW - 1).astype(np.int32)
    jj = np.where(jj == ii, np.clip(ii + 1, 0, MW - 1), jj)

    nets_e = jnp.zeros((N, h8, w8, 128), fdt)
    inps_e = jnp.zeros((N, h8, w8, 128), fdt)
    target0 = jnp.zeros((N, h8, w8, 2))
    cams = jnp.zeros(N, jnp.int32)
    kk = jnp.asarray(ii)
    iid, jjd = jnp.asarray(ii), jnp.asarray(jj)

    be, bm = schur_pairs(ii, MW)
    be, bm = jnp.asarray(be), jnp.asarray(bm)
    free = jnp.arange(MW) >= 1
    eta_base = 1e-4 * jnp.ones((MW, h8, w8))
    dsens = jnp.zeros((MW, h8, w8))

    from droid_slam_reserch_tpu.engine.factor_graph import _fused_rounds

    ROUNDS = 6  # iters1 + iters2 per keyframe (reference droid_frontend.py:24-25)
    fmap1_e = fmaps[iid, 0]
    fmap2_e = fmaps[jjd, 0]
    active_mask = jnp.ones(N, bool)
    has_edge = jnp.zeros(MW, bool).at[iid].set(True)
    damping = 1e-6 * jnp.ones((MW, h8, w8))
    empty_t = jnp.zeros((0, h8, w8, 2))

    # BA system builder: follow the engine default (Pallas on TPU — both
    # faster and closer to the fp32 oracle, see utils/config.py) unless
    # BENCH_PALLAS explicitly overrides for A/B runs
    from droid_slam_reserch_tpu.utils.config import resolve_pallas_ba

    env_pallas = os.environ.get("BENCH_PALLAS")
    use_pallas = (
        bool(int(env_pallas)) if env_pallas is not None
        else resolve_pallas_ba(cfg)
    )

    cull_ij = jnp.zeros(2, jnp.int32)

    def one_keyframe(poses, disps, damping, nets_e, target):
        """The whole per-keyframe frontend loop as one device program."""
        return _fused_rounds(
            applies["update"], params,
            poses, disps, dsens, damping, intr,
            fmap1_e, fmap2_e, nets_e, inps_e, target,
            iid, jjd, kk, active_mask, has_edge,
            iid, jjd, empty_t, empty_t,
            free, be, bm, cull_ij,
            rounds=ROUNDS, ba_iters=2, lm=1e-4, ep=0.1,
            damping_eps=1e-7, min_depth=0.25, beta=0.3, dtype=fdt,
            use_pallas=use_pallas,
        )

    # warmup / compile
    p, d, dmp, n_, t_, _, _, _ = one_keyframe(poses, disps, damping, nets_e, target0)
    jax.block_until_ready(p)
    p, d, dmp, n_, t_, _, _, _ = one_keyframe(p, d, dmp, n_, t_)
    jax.block_until_ready(p)

    t0 = time.perf_counter()
    for _ in range(iters):
        p, d, dmp, n_, t_, _, _, _ = one_keyframe(p, d, dmp, n_, t_)
    jax.block_until_ready(p)
    dt = time.perf_counter() - t0

    value = iters * ROUNDS / dt  # update iterations per second
    baseline = 60.0  # est. CUDA reference frontend update-iters/s (see module doc)

    extra = {}

    # --- keyframes/s: the whole per-keyframe device program (volume build +
    # window extraction + 6 fused rounds), i.e. frontend throughput with the
    # per-keyframe setup cost included, not just the round-loop rate.
    kf_iters = 2 if small else 10
    t0 = time.perf_counter()
    for _ in range(kf_iters):
        p2, d2, dmp2, n2, t2, _, _, _ = one_keyframe(poses, disps, damping, nets_e, target0)
    jax.block_until_ready(p2)
    extra["frontend_keyframes_per_s"] = round(kf_iters / (time.perf_counter() - t0), 3)

    # --- backend global BA at 500 keyframes: one full update_lowmem step
    # (scanned motion refresh over every edge + dense BA sweep) on a
    # temporal r=2 graph — the real engine path (reference
    # factor_graph.py:253-300), plus device memory high-water.
    if not small:
        try:
            from droid_slam_reserch_tpu.engine.factor_graph import FactorGraph
            from droid_slam_reserch_tpu.engine.video import Video

            T = 500
            buf = T + 24  # headroom for window bucketing past the counter
            cfgT = DroidConfig(image_size=(h8 * 8, w8 * 8), buffer=buf,
                               compute_dtype=dtype_str)
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
            graph = FactorGraph(video, applies["update"], params, dtype=fdt)
            graph.ii, graph.jj = iiT, jjT
            graph.age = np.zeros(len(iiT), np.int64)
            graph.net = jnp.zeros((len(iiT), h8, w8, 128), fdt)
            graph.target = jnp.zeros((len(iiT), h8, w8, 2))
            graph.weight = jnp.zeros((len(iiT), h8, w8, 2))

            graph.update_lowmem(steps=1, itrs=2)  # warmup/compile
            np.asarray(video.poses)[0]
            t0 = time.perf_counter()
            graph.update_lowmem(steps=1, itrs=2)
            np.asarray(video.poses)[0]
            extra["backend_ba_500kf_s"] = round(time.perf_counter() - t0, 3)
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                peak = stats.get("peak_bytes_in_use")
                if peak:
                    extra["peak_hbm_gib"] = round(peak / 2**30, 3)
            except Exception:
                pass
        except Exception as e:  # never let the extra metrics kill the bench
            extra["backend_ba_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- training at reference scale (reference train.py:155-159: 384x512,
    # 7 frames, 15 unrolled iterations, 2 BA solves per iteration, sized
    # for 24 GB GPUs): one optimizer step of the real make_train_step,
    # bf16 net + fp32 BA + per-iteration remat.  BENCH_TRAIN=0 skips.
    if not small and bool(int(os.environ.get("BENCH_TRAIN", "1"))):
        try:
            from tools.bench_train import synth_scene, temporal_graph
            from droid_slam_reserch_tpu.train.config import TrainConfig
            from droid_slam_reserch_tpu.train.step import (init_train_state,
                                                           make_train_step)

            H, W, F, IT = 384, 512, 7, 15
            tcfg = TrainConfig(steps=250000, iters=IT, n_frames=F,
                               image_size=(H, W))
            tii, tjj = temporal_graph(F, r=2)
            trng = np.random.default_rng(0)
            imgs, tposes, tdisps, tintr = synth_scene(trng, F, H, W)
            tbatch = {
                "images": jnp.asarray(imgs[None]),
                "poses": jnp.asarray(tposes[None]),
                "disps": jnp.asarray(tdisps[None]),
                "intrinsics": jnp.asarray(tintr[None]),
            }
            tdt = jnp.bfloat16 if on_tpu else None
            tparams, topt = init_train_state(tcfg, image_size=(64, 64))
            tstep = jax.jit(
                make_train_step(tcfg, tii, tjj, num_steps=IT, dtype=tdt,
                                remat=True, scan=True),
                donate_argnums=(0, 1),
            )
            t0 = time.perf_counter()
            tparams, topt, tm = tstep(tparams, topt, tbatch)
            float(tm["loss"])
            extra["train_compile_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            n_tsteps = 3
            for _ in range(n_tsteps):
                tparams, topt, tm = tstep(tparams, topt, tbatch)
                last_loss = float(tm["loss"])
            extra["train_step_s"] = round(
                (time.perf_counter() - t0) / n_tsteps, 3)
            extra["train_loss_finite"] = bool(np.isfinite(last_loss))
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                peak = stats.get("peak_bytes_in_use")
                if peak:
                    extra["train_peak_hbm_gib"] = round(peak / 2**30, 3)
            except Exception:
                pass
            del tparams, topt, tbatch
        except Exception as e:
            extra["train_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps({
        "metric": "frontend_update_iters_per_s",
        "value": round(value, 3),
        "unit": "iters/s",
        "vs_baseline": round(value / baseline, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
