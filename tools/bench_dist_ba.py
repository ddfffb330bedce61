"""Distributed-BA scaling measurement (VERDICT r3 item 1).

Times `dist_ba_solve` over a 512-keyframe window at shard counts {1,2,4,8}
on the virtual CPU mesh (the same harness CI uses for sharding parity) and
writes DIST_SCALING.json next to the MULTICHIP records.

The graph is proximity-style (radius-4 bidirectional, degree ~8) — the
shape of the reference backend's `max_factors=16t` global graph
(droid_backend.py:32) — so the shard-local work (per-edge block build +
per-bucket Schur einsum) dominates the way it does in a real global BA.

Caveat recorded in the output: all N virtual devices share one host's
cores, so these numbers measure the partitioned program's *total CPU work*
structure.  The one serial component (the root shard's dense [6MW]^2
assembly + Cholesky, ~0.5 s here) runs on ONE core; on real TPU hardware
it rides the MXU in milliseconds while the all_gathers ride ICI (comm
model below), so real-hardware efficiency is strictly better than the
virtual-mesh numbers reported here.

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


def proximity_graph(MW, rad=4):
    """Bidirectional radius-r edges — the backend global-graph shape."""
    ii, jj = [], []
    for r in range(1, rad + 1):
        ii.append(np.arange(MW - r))
        jj.append(np.arange(r, MW))
        ii.append(np.arange(r, MW))
        jj.append(np.arange(MW - r))
    return (np.concatenate(ii).astype(np.int32),
            np.concatenate(jj).astype(np.int32))


def comm_model(MW, n_max, max_range, Rmax, n, ici_GBps=45.0):
    """Bytes on the wire per GN iteration for n shards (fp32), and the time
    they would take on one v5e ICI link (~45 GB/s effective all-gather)."""
    if n == 1:
        return {"total_MB": 0.0, "ici_ms": 0.0}
    pose_blocks = n * 4 * n_max * (36 + 2) * 4          # blocks + (bi, bj)
    schur = n * max_range * ((Rmax + 1) ** 2 * 36 + (Rmax + 1)) * 4
    psums = 3 * 6 * MW * 4 + 6 * (MW + 1) * 4           # v, vE, dx
    total = pose_blocks + schur + psums
    return {
        "pose_blocks_MB": round(pose_blocks / 2**20, 3),
        "schur_blocks_MB": round(schur / 2**20, 3),
        "psum_MB": round(psums / 2**20, 4),
        "total_MB": round(total / 2**20, 3),
        "ici_ms": round(total / (ici_GBps * 2**30) * 1e3, 3),
    }


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

    ii, jj = proximity_graph(MW, rad=4)
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

    import multiprocessing

    cores = multiprocessing.cpu_count()
    iters = 2
    reps = 3
    results = {"MW": MW, "h8": h8, "w8": w8, "edges": len(ii),
               "iterations": iters, "graph": "proximity rad=4 (degree ~8)",
               "host_cores": cores,
               "note": "virtual CPU mesh — all N shards share this host's "
                       f"{cores} cores, so the physical parallel-speedup "
                       f"ceiling is {cores}x regardless of shard count; "
                       "efficiency_vs_core_ceiling is speedup / min(S, "
                       "cores).  On real multi-chip hardware each shard "
                       "owns its own chip; the serial residue is the root "
                       "pose solve (~0.25 s/iter on one CPU core, "
                       "sub-ms on an MXU) + the comm_per_iter bytes on ICI."}

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
        ii_s, jj_s, tgt_s, wgt_s, be_s, bm_s, k0_s, rlen_s = partition_edges(
            ii, jj, target, weight, MW, n
        )
        def solve():
            return dist_ba_solve(
                mesh, poses, disps, intr, dsens,
                jnp.asarray(tgt_s), jnp.asarray(wgt_s), eta,
                jnp.asarray(ii_s), jnp.asarray(jj_s), free,
                jnp.asarray(be_s), jnp.asarray(bm_s),
                jnp.asarray(k0_s), jnp.asarray(rlen_s),
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
            "efficiency_vs_core_ceiling": round(ref / dt / min(n, cores), 3),
            "edges_per_shard_padded": int(ii_s.shape[1]),
            "max_range": int(rlen_s.max()),
            "comm_per_iter": comm_model(
                MW, int(ii_s.shape[1]), int(rlen_s.max()),
                int(be_s.shape[2]), n,
            ),
        }
        err = float(np.abs(np.asarray(p2) - np.asarray(p)).max())
        results["shards"][str(n)]["max_pose_err_vs_single"] = round(err, 8)

        # exchange-strategy A/B at the largest shard count: on this CPU
        # mesh gather_root should win (one serial assembly instead of S
        # replicated dense scatters); on TPU the measured scatter
        # serialization inverts the choice (see parallel/dist_ba.py)
        if n == shard_counts[-1]:
            def solve_dense():
                return dist_ba_solve(
                    mesh, poses, disps, intr, dsens,
                    jnp.asarray(tgt_s), jnp.asarray(wgt_s), eta,
                    jnp.asarray(ii_s), jnp.asarray(jj_s), free,
                    jnp.asarray(be_s), jnp.asarray(bm_s),
                    jnp.asarray(k0_s), jnp.asarray(rlen_s),
                    iterations=iters, lm=1e-5, ep=1e-2,
                    exchange="dense_psum",
                )
            p3, _ = solve_dense()
            jax.block_until_ready(p3)
            t0 = time.perf_counter()
            for _ in range(reps):
                p3, _ = solve_dense()
            jax.block_until_ready(p3)
            dt3 = (time.perf_counter() - t0) / reps
            results["exchange_ab"] = {
                "shards": n,
                "gather_root_s": round(dt, 4),
                "dense_psum_s": round(dt3, 4),
                "note": "CPU mesh: gather_root expected faster; TPU "
                        "meshes auto-select dense_psum (measured v5e "
                        "scatter serialization, PROFILE.md)",
            }

    out = os.path.join(os.path.dirname(__file__), "..", "DIST_SCALING.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
