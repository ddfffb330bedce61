"""Differentiable projective geometry, covisibility graph utilities, losses.

TPU-native mirror of reference droid_slam/geom/ (projective_ops.py,
graph_utils.py, losses.py) — pure JAX, analytic Jacobians.
"""
from .projective import (
    coords_grid,
    iproj,
    proj,
    actp,
    projective_transform,
    projmap,
    induced_flow,
    frame_distance,
    MIN_DEPTH,
)
from .graph_utils import (
    graph_to_edge_list,
    keyframe_indicies,
    neighbourhood_graph,
)
from . import losses

__all__ = [k for k in dir() if not k.startswith("_")]
