"""Visualization: point-cloud backprojection, multi-view depth filtering,
PLY export, and an optional Open3D live viewer.

Mirror of reference droid_slam/visualization.py + the iproj/depth_filter
CUDA kernels (src/droid_kernels.cu:661-850).  On TPU there is no shared
GPU memory between processes — the viewer consumes host snapshots of dirty
keyframes instead (SURVEY.md §2.7 "process parallelism").
"""
from .pointcloud import backproject_points, depth_filter, export_ply, reconstruction_pointcloud
from .live import LiveViewer

__all__ = [k for k in dir() if not k.startswith("_")]
