"""End-to-end SLAM throughput on the chip: full Droid.track() frames/s.

Runs the whole engine (motion filter -> keyframe admission -> fused
frontend rounds -> host bookkeeping) on a synthetic textured sequence at
EuRoC resolution (320x512, mono, random weights), with every frame forced
to keyframe — an upper bound on per-frame work (real sequences keyframe
~1/3 of frames).  Then one terminate() (global backend 7+12 sweeps).

Prints one JSON line.  Run on the TPU: python tools/bench_e2e.py
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

    from droid_slam_reserch_tpu.engine import Droid
    from droid_slam_reserch_tpu.utils import EUROC_CONFIG

    H, W = 320, 512
    n_frames = int(os.environ.get("BENCH_E2E_FRAMES", "48"))
    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = EUROC_CONFIG.replace(
        image_size=(H, W), buffer=max(n_frames + 16, 64),
        filter_thresh=-1.0, keyframe_thresh=0.0, warmup=8,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    intr = np.array([435.2, 435.2, W / 2.0, H / 2.0], np.float32)

    rng = np.random.RandomState(0)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    frames = []
    for t in range(n_frames):
        img = (
            127
            + 70 * np.sin(0.11 * (xs + 9 * t)) * np.cos(0.07 * (ys + 4 * t))
            + 25 * np.sin(0.031 * (xs - 5 * t) + 1.3)
            + 10 * rng.standard_normal((H, W))
        )
        frames.append(
            np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)
        )

    droid = Droid(cfg)
    # warm the compile caches with the first frames (admission, init, update)
    for t in range(12):
        droid.track(float(t), frames[t], intrinsics=intr)

    from droid_slam_reserch_tpu.utils.timing import SYNC_COUNT

    SYNC_COUNT[0] = 0
    per_frame = []
    for t in range(12, n_frames):
        t0 = time.perf_counter()
        droid.track(float(t), frames[t], intrinsics=intr)
        np.asarray(droid.video.poses)[0]
        per_frame.append(time.perf_counter() - t0)
    dt = sum(per_frame)
    fps = (n_frames - 12) / dt
    tail = per_frame[-12:]
    fps_tail = len(tail) / sum(tail)
    syncs_per_frame = SYNC_COUNT[0] / (n_frames - 12)

    t0 = time.perf_counter()
    droid.terminate()
    np.asarray(droid.video.poses)[0]
    t_term = time.perf_counter() - t0

    print(json.dumps({
        "metric": "e2e_track_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s (every frame keyframed, 320x512 mono)",
        "extra": {
            "keyframes": int(droid.video.counter),
            "terminate_s": round(t_term, 3),
            "fps_last12": round(fps_tail, 3),
            "syncs_per_frame": round(syncs_per_frame, 3),
            "s_per_frame": [round(x, 2) for x in per_frame],
        },
    }))


if __name__ == "__main__":
    main()
