"""On-chip per-section profile of the frontend hot path (VERDICT r2 item 1a).

Times each stage of one fused frontend round at EuRoC scale (E=48 edges,
24-kf window, 40x64 at 1/8 res) in isolation, plus the correlation-lookup
variants, and prints a JSON breakdown.  Run on the TPU:

    python tools/profile_frontend.py

Sections (one fused round = reproject + corr lookup + GRU update + agg +
2-iter dense BA; reference factor_graph.py:198-241):
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _sync(out):
    """Force a real device->host sync (on the axon tunnel,
    jax.block_until_ready does not reliably block; np.asarray does)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[:1])


def timeit(fn, *args, iters=20, warmup=2, label=None):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    if label:
        print(f"  {label}: {ms:.3f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from droid_slam_reserch_tpu.ba.solver import ba_solve, schur_pairs
    from droid_slam_reserch_tpu.engine.net_ops import make_applies
    from droid_slam_reserch_tpu.engine.droid import init_params
    from droid_slam_reserch_tpu.engine.factor_graph import _fused_rounds
    from droid_slam_reserch_tpu.geom import projective_transform
    from droid_slam_reserch_tpu.utils import DroidConfig
    from droid_slam_reserch_tpu.lie import se3_exp
    from droid_slam_reserch_tpu.ops import corr as C

    h8, w8, N, MW = 40, 64, 48, 24
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype_str = "bfloat16" if on_tpu else "float32"
    fdt = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = DroidConfig(image_size=(h8 * 8, w8 * 8), buffer=MW, compute_dtype=dtype_str)
    params = init_params(cfg.replace(image_size=(64, 64)), seed=0)
    applies = make_applies(dtype_str)

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

    f1 = fmaps[iid, 0]
    f2 = fmaps[jjd, 0]
    P = h8 * w8

    res = {}

    # ---- reprojection
    reproj = jax.jit(lambda p, d: projective_transform(
        p[None], d[None], intr_win[None], iid, jjd)[0][0])
    res["reproject_ms"] = timeit(reproj, poses, disps, label="reproject")
    coords1 = reproj(poses, disps)
    cflat = coords1.reshape(N, P, 2)

    # ---- volume + pyramid build variants (once per keyframe)
    from droid_slam_reserch_tpu.ops.pallas_corr import (
        corr_build_pmajor_pallas, corr_extract_windows_pallas,
        corr_lookup_blocked_pallas, corr_lookup_windows_pallas)

    build = jax.jit(lambda a, b: C.build_pyramid_flat(C.corr_volume_flat(a, b, dtype=fdt)))
    res["volume_pyramid_build_xla_ms"] = timeit(build, f1, f2, iters=10, label="volume+pyramid build (XLA)")
    pyr = build(f1, f2)

    build_pl = jax.jit(lambda a, b: corr_build_pmajor_pallas(a, b, dtype=fdt)[0])
    res["volume_pyramid_build_pallas_ms"] = timeit(build_pl, f1, f2, iters=10, label="build (pallas fused)")
    levels, meta, PB = corr_build_pmajor_pallas(f1, f2, dtype=fdt)

    # ---- lookup variants (per round cost)
    lk_flat = jax.jit(lambda p0, p1, p2, p3, c: C.corr_lookup_pyramid_flat([p0, p1, p2, p3], c))
    res["lookup_flat_ms"] = timeit(lk_flat, *pyr, cflat, label="lookup flat (XLA)")

    lk_pl = jax.jit(lambda v0, v1, v2, v3, c: corr_lookup_blocked_pallas([v0, v1, v2, v3], meta, c))
    res["lookup_pallas_ms"] = timeit(lk_pl, *levels, cflat, label="lookup pallas (full)")

    extract = jax.jit(lambda v0, v1, v2, v3, c: corr_extract_windows_pallas([v0, v1, v2, v3], meta, c))
    res["window_extract_ms"] = timeit(extract, *levels, cflat, iters=10, label="window extract (per keyframe)")
    wins, bases = extract(*levels, cflat)
    wmeta = meta
    lk_w = jax.jit(lambda w, b, c: corr_lookup_windows_pallas(w, b, wmeta, c))
    res["lookup_windows_ms"] = timeit(lk_w, wins, bases, cflat, label="lookup pallas (windowed)")

    # parity checks vs flat
    a = np.asarray(lk_flat(*pyr, cflat), np.float32)
    b = np.asarray(lk_pl(*levels, cflat), np.float32)
    res["pallas_max_err"] = float(np.abs(a - b).max())
    b = np.asarray(lk_w(wins, bases, cflat), np.float32)
    res["windows_max_err"] = float(np.abs(a - b).max())

    # ---- update op (GRU + agg) alone
    nets_e = jnp.zeros((N, h8, w8, 128), fdt)
    inps_e = jnp.zeros((N, h8, w8, 128), fdt)
    corr = jnp.asarray(a.reshape(N, h8, w8, -1), fdt)
    motn = jnp.zeros((N, h8, w8, 4), fdt)

    upd = jax.jit(lambda n_, i_, c_, m_: applies["update"](
        params, n_[None], i_[None], c_[None], m_[None], kk, MW))
    res["update_module_ms"] = timeit(upd, nets_e, inps_e, corr, motn, label="update module")

    # ---- dense BA (2 GN iters) alone
    be, bm = schur_pairs(ii, MW)
    be, bm = jnp.asarray(be), jnp.asarray(bm)
    free = jnp.arange(MW) >= 1
    target = jnp.asarray(coords1)
    weight = 0.5 * jnp.ones((N, h8, w8, 2))
    eta = 1e-4 * jnp.ones((MW, h8, w8))
    dsens = jnp.zeros((MW, h8, w8))

    def ba2(p, d, use_pallas):
        return ba_solve(p, d, intr, dsens, target, weight, eta, iid, jjd,
                        free, be, bm, iterations=2, lm=1e-4, ep=0.1,
                        min_depth=0.25, use_pallas=use_pallas)
    res["ba_2iter_xla_ms"] = timeit(lambda p, d: ba2(p, d, False), poses, disps, label="ba 2iter xla")
    if on_tpu:
        res["ba_2iter_pallas_ms"] = timeit(lambda p, d: ba2(p, d, True), poses, disps, label="ba 2iter pallas")

    # ---- whole fused program (6 rounds) for reference
    active_mask = jnp.ones(N, bool)
    has_edge = jnp.zeros(MW, bool).at[iid].set(True)
    damping = 1e-6 * jnp.ones((MW, h8, w8))
    empty_t = jnp.zeros((0, h8, w8, 2))
    target0 = jnp.zeros((N, h8, w8, 2))

    def fused(p, d):
        return _fused_rounds(
            applies["update"], params, p, d, dsens, damping, intr,
            f1, f2, nets_e, inps_e, target0,
            iid, jjd, kk, active_mask, has_edge,
            iid, jjd, empty_t, empty_t, free, be, bm,
            jnp.zeros(2, jnp.int32),
            rounds=6, ba_iters=2, lm=1e-4, ep=0.1,
            damping_eps=1e-7, min_depth=0.25, beta=0.3, dtype=fdt,
        )
    res["fused_6rounds_ms"] = timeit(fused, poses, disps, iters=10, label="fused 6 rounds")
    res["fused_per_round_ms"] = round(res["fused_6rounds_ms"] / 6, 3)
    sum_parts = (res["reproject_ms"] + res["lookup_windows_ms"] +
                 res["update_module_ms"] + res.get("ba_2iter_pallas_ms", res["ba_2iter_xla_ms"]))
    res["sum_parts_per_round_ms"] = round(sum_parts, 3)
    res["volume_amortized_per_round_ms"] = round(
        (res["volume_pyramid_build_pallas_ms"] + res["window_extract_ms"]) / 6, 3)

    for k, v in res.items():
        if isinstance(v, float):
            res[k] = round(v, 3)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
