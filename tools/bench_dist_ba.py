"""Distributed-BA scaling measurement (VERDICT r2 item 8).

Times `dist_ba_solve` over a 512-keyframe window at shard counts {1,2,4,8}
on the virtual CPU mesh (the same harness CI uses for sharding parity) and
writes DIST_SCALING.json next to the MULTICHIP records.

Caveat recorded in the output: all N virtual devices share one host's
cores, so absolute times and parallel efficiency on this mesh measure the
partitioned program's *overhead structure* (replicated pose system + psum
vs shard-local depth work), not ICI-connected TPU scaling.  On real
multi-chip hardware the shard-local Schur work (the dominant FLOPs) scales
with devices while the psum'd [MW*6]^2 pose system stays fixed.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/bench_dist_ba.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from droid_slam_reserch_tpu.ba.solver import ba_solve, schur_pairs
    from droid_slam_reserch_tpu.lie import se3_exp
    from droid_slam_reserch_tpu.parallel.dist_ba import (
        dist_ba_solve, partition_edges,
    )

    MW, h8, w8 = 512, 30, 40
    key = jax.random.PRNGKey(0)
    poses = se3_exp(0.01 * jax.random.normal(key, (MW, 6)))
    disps = jnp.ones((MW, h8, w8))
    intr = jnp.array([w8 * 4.0, w8 * 4.0, w8 / 2.0, h8 / 2.0])
    dsens = jnp.zeros((MW, h8, w8))
    eta = 1e-4 * jnp.ones((MW, h8, w8))
    free = jnp.arange(MW) >= 1

    ii = np.concatenate([np.arange(MW - 1), np.arange(MW - 2)]).astype(np.int32)
    jj = np.concatenate([np.arange(1, MW), np.arange(2, MW)]).astype(np.int32)
    # well-conditioned targets (GT reprojection + noise) so the single- vs
    # multi-shard parity delta measures the partitioning, not chaotic
    # divergence of an unsolvable random problem
    from droid_slam_reserch_tpu.geom import projective_transform

    intrT = jnp.broadcast_to(intr, (MW, 4))
    coords, _ = projective_transform(
        poses[None], disps[None], intrT[None], jnp.asarray(ii), jnp.asarray(jj)
    )
    target = np.asarray(coords[0]) + 0.2 * np.random.RandomState(0).standard_normal(
        (len(ii), h8, w8, 2)
    ).astype(np.float32)
    weight = 0.5 * np.ones((len(ii), h8, w8, 2), np.float32)

    iters = 2
    reps = 3
    results = {"MW": MW, "h8": h8, "w8": w8, "edges": len(ii),
               "iterations": iters,
               "note": "virtual CPU mesh — all shards share one host's cores; "
                       "see module docstring"}

    # single-device reference (the engine's ba_solve)
    be, bm = schur_pairs(ii, MW)
    args = (poses, disps, intr, dsens, jnp.asarray(target), jnp.asarray(weight),
            eta, jnp.asarray(ii), jnp.asarray(jj), free,
            jnp.asarray(be), jnp.asarray(bm))
    p, d = ba_solve(*args, iterations=iters, lm=1e-5, ep=1e-2)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(reps):
        p, d = ba_solve(*args, iterations=iters, lm=1e-5, ep=1e-2)
    jax.block_until_ready(p)
    t1 = (time.perf_counter() - t0) / reps
    results["single_device"] = {
        "s_per_solve": round(t1, 4),
        "ba_iters_per_s": round(iters / t1, 3),
        "keyframes_per_s": round(MW / t1, 2),
    }

    shard_counts = [n for n in (1, 2, 4, 8) if n <= jax.device_count()]
    results["shards"] = {}
    ref = None
    for n in shard_counts:
        mesh = Mesh(np.array(jax.devices()[:n]), ("kf",))
        ii_s, jj_s, tgt_s, wgt_s, be_s, bm_s = partition_edges(
            ii, jj, target, weight, MW, n
        )
        def solve():
            return dist_ba_solve(
                mesh, poses, disps, intr, dsens,
                jnp.asarray(tgt_s), jnp.asarray(wgt_s), eta,
                jnp.asarray(ii_s), jnp.asarray(jj_s), free,
                jnp.asarray(be_s), jnp.asarray(bm_s),
                iterations=iters, lm=1e-5, ep=1e-2,
            )
        p2, d2 = solve()
        jax.block_until_ready(p2)
        t0 = time.perf_counter()
        for _ in range(reps):
            p2, d2 = solve()
        jax.block_until_ready(p2)
        dt = (time.perf_counter() - t0) / reps
        if ref is None:
            ref = dt
        results["shards"][str(n)] = {
            "s_per_solve": round(dt, 4),
            "ba_iters_per_s": round(iters / dt, 3),
            "keyframes_per_s": round(MW / dt, 2),
            "speedup_vs_1shard": round(ref / dt, 3),
            "efficiency": round(ref / dt / n, 3),
        }
        err = float(np.abs(np.asarray(p2) - np.asarray(p)).max())
        results["shards"][str(n)]["max_pose_err_vs_single"] = round(err, 8)

    out = os.path.join(os.path.dirname(__file__), "..", "DIST_SCALING.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
