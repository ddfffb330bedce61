"""Covisibility graph utilities (reference droid_slam/geom/graph_utils.py)."""
from collections import OrderedDict

import numpy as np


def graph_to_edge_list(graph):
    """Graph dict {u: [v, ...]} -> (ii, jj, kk) numpy arrays (reference :10-21)."""
    ii, jj, kk = [], [], []
    for s, u in enumerate(graph):
        for v in graph[u]:
            ii.append(u)
            jj.append(v)
            kk.append(s)
    return np.asarray(ii, dtype=np.int32), np.asarray(jj, dtype=np.int32), np.asarray(kk, dtype=np.int32)


def keyframe_indicies(graph):
    return np.asarray([u for u in graph], dtype=np.int32)


def neighbourhood_graph(n, r):
    """All ordered pairs with 1 <= |i-j| <= r (reference :31-34)."""
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    d = np.abs(ii - jj)
    keep = (d >= 1) & (d <= r)
    return ii[keep].astype(np.int32), jj[keep].astype(np.int32)


def build_frame_graph(distance_matrix, num=16, thresh=24.0, r=2):
    """Training covisibility graph from a precomputed flow-distance matrix.

    reference graph_utils.py:37-66 — radius-r temporal edges plus greedy
    closest pairs under thresh until `num` edges exist.  The flow-distance
    matrix itself comes from data.rgbd_utils.compute_distance_matrix_flow.
    """
    d = np.array(distance_matrix, dtype=np.float64, copy=True)
    N = d.shape[0]
    count = 0
    graph = OrderedDict()
    for i in range(N):
        graph[i] = []
        d[i, i] = np.inf
        for j in range(i - r, i + r + 1):
            if 0 <= j < N and i != j:
                graph[i].append(j)
                d[i, j] = np.inf
                count += 1

    while count < num:
        ix = np.argmin(d)
        i, j = ix // N, ix % N
        if d[i, j] < thresh:
            graph[i].append(j)
            d[i, j] = np.inf
            count += 1
        else:
            break
    return graph
