"""Training at reference scale on the chip (reference train.py:102-118,155-159).

Builds a synthetic TartanAir-like scene at the reference's training shapes
(384x512, 7 frames, 15 unrolled update iterations, 2 BA solves per
iteration — train.py:155-159, sized for 24 GB GPUs) and runs the real
`make_train_step` on whatever device JAX selects (the v5e chip under axon;
CPU with JAX_PLATFORMS=cpu for smoke runs).

Measures: compile time, steady-state step time / steps-per-second, peak
HBM, and (with --steps >= N) the loss curve over repeated steps on the
fixed scene — overfitting a single batch, the loss must fall.

Usage:
  python tools/bench_train.py                 # timing: 3 measured steps
  python tools/bench_train.py --steps 50      # + loss-decrease curve
  python tools/bench_train.py --no-remat      # A/B the remat lever
  python tools/bench_train.py --size 192 256 --iters 4   # reduced smoke

Prints one JSON line with the results.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_scene(rng, n_frames, H, W):
    """A geometrically consistent synthetic scene: smooth forward motion
    over a textured fronto-parallel-ish depth field (TartanAir-style
    layout: poses w2c, disps = inverse depth, intrinsics full-res)."""
    fx = fy = 0.6 * W
    cx, cy = W / 2.0, H / 2.0
    intrinsics = np.broadcast_to(
        np.array([fx, fy, cx, cy], np.float32), (n_frames, 4))

    # smooth trajectory: small forward steps + tiny rotations
    poses = np.zeros((n_frames, 7), np.float32)
    poses[:, 6] = 1.0
    for t in range(n_frames):
        poses[t, 0] = 0.04 * t + 0.01 * rng.standard_normal()
        poses[t, 2] = 0.10 * t
        poses[t, 3:6] = 0.01 * rng.standard_normal(3)
        q = np.concatenate([poses[t, 3:6], [1.0]])
        poses[t, 3:] = q / np.linalg.norm(q)

    # depth: smooth random field in [4, 12] m -> disps in [1/12, 1/4]
    base = rng.uniform(0.5, 1.0, (n_frames, H // 32, W // 32)).astype(np.float32)
    up = np.kron(base, np.ones((32, 32), np.float32))
    depth = 4.0 + 8.0 * up[:, :H, :W]
    disps = (1.0 / depth).astype(np.float32)

    # textured images: band-limited noise, BGR 0-255
    imgs = rng.uniform(0, 255, (n_frames, H // 8, W // 8, 3)).astype(np.float32)
    images = np.kron(imgs, np.ones((8, 8, 1), np.float32))[:, :H, :W]
    return images, poses, disps, intrinsics


def temporal_graph(n_frames, r=2):
    ii, jj = [], []
    for i in range(n_frames):
        for j in range(n_frames):
            if i != j and abs(i - j) <= r:
                ii.append(i)
                jj.append(j)
    return np.asarray(ii, np.int32), np.asarray(jj, np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[384, 512])
    ap.add_argument("--frames", type=int, default=7)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3,
                    help="measured optimizer steps (>=20 => loss curve)")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--no-scan", action="store_true",
                    help="Python-unroll the iterations instead of lax.scan "
                         "(same numerics, ~10x the compile time)")
    ap.add_argument("--fp32", action="store_true",
                    help="net compute in fp32 (default bf16 on TPU)")
    ap.add_argument("--debug", action="store_true",
                    help="print the full metrics dict every step")
    ap.add_argument("--schedule-steps", type=int, default=250000,
                    help="OneCycle horizon (reference train.py:70 trains "
                         "250k steps; short horizons reach peak lr almost "
                         "immediately and diverge a fresh random init)")
    ap.add_argument("--parallel", action="store_true",
                    help="run make_parallel_train_step over a dp mesh of "
                         "all local devices (the DDP analog) instead of "
                         "the single-device step")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # the container's sitecustomize force-selects the axon TPU; honor an
    # explicit JAX_PLATFORMS request (CPU smoke runs)
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass

    import jax.numpy as jnp

    from droid_slam_reserch_tpu.train.config import TrainConfig
    from droid_slam_reserch_tpu.train.step import init_train_state, make_train_step

    H, W = args.size
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = None if (args.fp32 or not on_tpu) else jnp.bfloat16
    remat = not args.no_remat

    cfg = TrainConfig(steps=args.schedule_steps, iters=args.iters,
                      n_frames=args.frames, image_size=(H, W))
    ii, jj = temporal_graph(args.frames, r=2)

    rng = np.random.default_rng(0)
    images, poses, disps, intrinsics = synth_scene(rng, args.frames, H, W)
    B = args.batch
    batch = {
        "images": jnp.asarray(np.broadcast_to(images, (B,) + images.shape)),
        "poses": jnp.asarray(np.broadcast_to(poses, (B,) + poses.shape)),
        "disps": jnp.asarray(np.broadcast_to(disps, (B,) + disps.shape)),
        "intrinsics": jnp.asarray(
            np.broadcast_to(intrinsics, (B,) + intrinsics.shape)),
    }

    params, opt_state = init_train_state(cfg, image_size=(64, 64))
    if args.parallel:
        # dp mesh over every local device (DDP analog) — on one chip this
        # executes the same sharded program the multi-chip path compiles
        from jax.sharding import Mesh

        from droid_slam_reserch_tpu.parallel.train_parallel import (
            make_parallel_train_step)

        mesh = Mesh(np.array(jax.devices()), ("dp",))
        step, prepare = make_parallel_train_step(
            cfg, ii, jj, mesh, num_steps=args.iters, dtype=dtype,
            remat=remat, scan=not args.no_scan,
            donate=bool(int(os.environ.get("BENCH_PAR_DONATE", "1"))))
        params, opt_state, batch = prepare(params, opt_state, batch)
    else:
        step = jax.jit(
            make_train_step(cfg, ii, jj, num_steps=args.iters, dtype=dtype,
                            remat=remat, debug=args.debug,
                            scan=not args.no_scan),
            donate_argnums=(0, 1),
        )

    t0 = time.perf_counter()
    params, opt_state, metrics = step(params, opt_state, batch)
    first_loss = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    if args.debug:
        print("step 0:", {k: round(float(v), 5) for k, v in metrics.items()})
    losses = [first_loss]
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))  # device sync each step
        if args.debug:
            print(f"step {i + 1}:",
                  {k: round(float(v), 5) for k, v in metrics.items()})
    dt = time.perf_counter() - t0
    step_s = dt / args.steps

    out = {
        "metric": "train_step_s",
        "value": round(step_s, 3),
        "unit": "s/step",
        "platform": jax.devices()[0].platform,
        "shape": {"H": H, "W": W, "frames": args.frames,
                  "iters": args.iters, "batch": B, "edges": int(len(ii))},
        "dtype": "bfloat16" if dtype is not None else "float32",
        "remat": remat,
        "scan": not args.no_scan,
        "parallel": args.parallel,
        "compile_s": round(compile_s, 1),
        "steps_per_s": round(1.0 / step_s, 4),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
    }
    if args.steps >= 20:
        k = max(args.steps // 10, 2)
        out["loss_head_mean"] = round(float(np.mean(losses[:k])), 4)
        out["loss_tail_mean"] = round(float(np.mean(losses[-k:])), 4)
        out["loss_decreased"] = bool(out["loss_tail_mean"] < out["loss_head_mean"])
        out["loss_curve"] = [round(v, 4) for v in losses[:: max(1, args.steps // 25)]]
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            out["peak_hbm_gib"] = round(peak / 2**30, 3)
    except Exception:
        pass

    print(json.dumps(out))


if __name__ == "__main__":
    main()
