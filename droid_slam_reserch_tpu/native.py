"""ctypes bindings for the native host graph library (native/graph_ops.cpp).

Auto-builds libgraphops.so on first use (g++ is in the image); every entry
point has a pure-numpy fallback so the package works without a compiler.
"""
import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraphops.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "graph_ops.cpp"))
        ):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        lib.schur_buckets.restype = ctypes.c_int
        lib.schur_buckets.argtypes = [i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, u8p]
        lib.proximity_select.restype = ctypes.c_int
        lib.proximity_select.argtypes = [
            f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_longlong, ctypes.c_int,
            i32p, i32p, ctypes.c_int, ctypes.c_int, i32p, i32p, ctypes.c_int,
        ]
        lib.dedup_edges.restype = None
        lib.dedup_edges.argtypes = [i64p, i64p, ctypes.c_int, i64p, i64p, ctypes.c_int, u8p]
        _lib = lib
    except Exception as e:
        # no silent caps: the numpy fallbacks are correct but slower on
        # large graphs — say so once
        from .utils.log import log_once

        log_once(
            "native_build_failed",
            f"native graph library unavailable ({type(e).__name__}: {e}); "
            "using numpy fallbacks for Schur buckets / NMS / dedup",
        )
        _lib = None
    return _lib


def have_native():
    return _load() is not None


def schur_buckets(ii, num_buckets, R):
    """Native bucket tables; returns (edges [M,R] int32, mask [M,R] bool, max_deg)."""
    lib = _load()
    ii = np.ascontiguousarray(ii, np.int32)
    if lib is None:
        from .ba.solver import schur_pairs

        edges, mask = schur_pairs(ii, num_buckets, max_deg=R)
        counts = np.bincount(ii[(ii >= 0) & (ii < num_buckets)], minlength=num_buckets)
        return edges, mask, int(counts.max()) if len(counts) else 0
    edges = np.zeros((num_buckets, R), np.int32)
    mask = np.zeros((num_buckets, R), np.uint8)
    max_deg = lib.schur_buckets(ii, len(ii), num_buckets, R, edges, mask.reshape(-1))
    return edges, mask.astype(bool), int(max_deg)


def bucket_tables(ii, num_buckets, round_to=4):
    """Schur bucket tables with the max degree rounded up (stable jit keys).

    Returns (edges [M,R], mask [M,R] bool).
    """
    ii = np.asarray(ii, np.int32)
    valid = ii[(ii >= 0) & (ii < num_buckets)]
    max_deg = int(np.bincount(valid, minlength=num_buckets).max()) if len(valid) else 1
    R = ((max(max_deg, 1) + 1 + round_to - 1) // round_to) * round_to - 1
    edges, mask, _ = schur_buckets(ii, num_buckets, R)
    return edges, mask


def proximity_select(d, t0, t1, t, rad, nms, thresh, max_factors, ex_i, ex_j, stereo):
    """Native greedy NMS edge selection; returns (ii, jj) int arrays."""
    lib = _load()
    if lib is None:
        return None  # caller falls back to the Python implementation
    d = np.ascontiguousarray(d, np.float64).reshape(-1)
    ex_i = np.ascontiguousarray(ex_i, np.int32)
    ex_j = np.ascontiguousarray(ex_j, np.int32)
    cap = 4 * (t - t0) * max(rad + 2, 2) + 2 * len(d) // max(t - t0, 1) + 4096
    out_i = np.zeros(cap, np.int32)
    out_j = np.zeros(cap, np.int32)
    m = lib.proximity_select(
        d, t0, t1, t, rad, nms, float(thresh), int(max_factors), 0,
        ex_i, ex_j, len(ex_i), int(stereo), out_i, out_j, cap,
    )
    return out_i[:m].astype(np.int64), out_j[:m].astype(np.int64)


def dedup_edges(ii, jj, ex_i, ex_j):
    """keep mask for edges not already in (ex_i, ex_j)."""
    lib = _load()
    ii = np.ascontiguousarray(ii, np.int64)
    jj = np.ascontiguousarray(jj, np.int64)
    if lib is None:
        eset = set(zip(ex_i.tolist(), ex_j.tolist()))
        return np.array([(i, j) not in eset for i, j in zip(ii.tolist(), jj.tolist())], bool)
    ex_i = np.ascontiguousarray(ex_i, np.int64)
    ex_j = np.ascontiguousarray(ex_j, np.int64)
    keep = np.zeros(len(ii), np.uint8)
    lib.dedup_edges(ii, jj, len(ii), ex_i, ex_j, len(ex_i), keep)
    return keep.astype(bool)
