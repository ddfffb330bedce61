"""SLAM runtime: keyframe buffer, motion filter, factor graph, frontend,
backend, trajectory filler, and the Droid facade.

TPU-native redesign of reference droid_slam/ (depth_video.py,
motion_filter.py, factor_graph.py, droid_frontend.py, droid_backend.py,
trajectory_filler.py, droid.py): host Python owns the data-dependent
decisions (keyframe admission, edge selection, culling) exactly where the
reference does, while every numeric step — reprojection, correlation,
update operator, dense BA — is a bucketed static-shape jit program.
"""
from .video import Video
from .motion_filter import MotionFilter
from .factor_graph import FactorGraph
from .frontend import Frontend
from .backend import Backend
from .trajectory_filler import TrajectoryFiller
from .droid import Droid

__all__ = [k for k in dir() if not k.startswith("_")]
