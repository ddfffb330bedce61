"""Native host library (graph_ops) parity tests vs pure-Python references."""
import numpy as np
import pytest

from droid_slam_reserch_tpu import native
from droid_slam_reserch_tpu.ba.solver import schur_pairs


def test_native_builds():
    assert native.have_native(), "libgraphops.so should build (g++ in image)"


def test_schur_buckets_matches_python():
    rng = np.random.RandomState(0)
    ii = rng.randint(0, 16, 100).astype(np.int32)
    edges_py, mask_py = schur_pairs(ii, 16)
    R = edges_py.shape[1]
    edges_nat, mask_nat, max_deg = native.schur_buckets(ii, 16, R)
    np.testing.assert_array_equal(edges_nat, edges_py)
    np.testing.assert_array_equal(mask_nat, mask_py)
    assert max_deg == int(np.bincount(ii, minlength=16).max())


def test_bucket_tables_rounding():
    ii = np.array([0, 0, 0, 1, 2], np.int32)
    edges, mask = native.bucket_tables(ii, 4, round_to=4)
    # max_deg 3 -> R = round_up(4,4)-1 = 3
    assert edges.shape == (4, 3)
    assert mask[0].sum() == 3 and mask[1].sum() == 1 and mask[3].sum() == 0


def test_dedup_matches_python():
    rng = np.random.RandomState(1)
    ii = rng.randint(0, 10, 50).astype(np.int64)
    jj = rng.randint(0, 10, 50).astype(np.int64)
    ex_i = rng.randint(0, 10, 30).astype(np.int64)
    ex_j = rng.randint(0, 10, 30).astype(np.int64)
    keep = native.dedup_edges(ii, jj, ex_i, ex_j)
    eset = set(zip(ex_i.tolist(), ex_j.tolist()))
    expect = np.array([(i, j) not in eset for i, j in zip(ii, jj)])
    np.testing.assert_array_equal(keep, expect)


def _python_proximity(d, t0, t1, t, rad, nms, thresh, max_factors, ex, stereo):
    """Reference-faithful reimplementation (factor_graph.py:315-379) for parity."""
    leni, lenj = t - t0, t - t1
    d = d.astype(np.float64).reshape(-1).copy()

    def suppress(i, j):
        for di in range(-nms, nms + 1):
            for dj in range(-nms, nms + 1):
                if abs(di) + abs(dj) <= max(min(abs(i - j) - 2, nms), 0):
                    i1, j1 = i + di, j + dj
                    if (t0 <= i1 < t) and (t1 <= j1 < t):
                        d[(i1 - t0) * lenj + (j1 - t1)] = np.inf

    ii, jj = np.meshgrid(np.arange(t0, t), np.arange(t1, t), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    d[ii - rad < jj] = np.inf
    d[d > 100] = np.inf
    for i, j in ex:
        suppress(i, j)

    es = []
    for i in range(t0, t):
        if stereo:
            es.append((i, i))
            if t1 <= i:
                d[(i - t0) * lenj + (i - t1)] = np.inf
        for j in range(max(i - rad - 1, 0), i):
            es.append((i, j))
            es.append((j, i))
            if t1 <= j < t:
                d[(i - t0) * lenj + (j - t1)] = np.inf

    for k in np.argsort(d, kind="stable"):
        if d[k] > thresh:
            break
        if max_factors > 0 and len(es) > max_factors:
            break
        i, j = int(ii[k]), int(jj[k])
        es.append((i, j))
        es.append((j, i))
        suppress(i, j)
    return es


@pytest.mark.parametrize("stereo", [False, True])
def test_proximity_select_matches_python(stereo):
    rng = np.random.RandomState(2)
    t0, t1, t = 0, 0, 12
    d = 5.0 + 20.0 * rng.rand(t - t0, t - t1)
    ex = [(3, 7), (8, 2)]
    args = (t0, t1, t, 2, 2, 16.0, 60)

    es_py = _python_proximity(d.copy(), *args, ex, stereo)
    si, sj = native.proximity_select(
        d.copy(), *args,
        np.array([e[0] for e in ex], np.int32),
        np.array([e[1] for e in ex], np.int32),
        stereo,
    )
    es_nat = list(zip(si.tolist(), sj.tolist()))
    assert es_nat == es_py
