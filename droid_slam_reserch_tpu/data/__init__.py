"""Dataset streams and training datasets.

Mirror of reference droid_slam/data_readers/ + the per-script image_stream
generators (SURVEY.md §2.5).  Streams yield numpy tuples
``(t, image, intrinsics)`` or ``(t, image, depth, intrinsics)`` where image
is [H, W, 3] uint8 BGR (or [2, H, W, 3] stereo) and intrinsics is [4]
(fx, fy, cx, cy) at stream resolution.
"""
from .streams import generic_image_stream, resize_to_area
from .euroc import euroc_stream, EUROC_INTRINSICS
from .tum import tum_stream
from .eth3d import eth3d_stream, eth3d_timestamps
from .tartan import tartan_stream, TartanAir
from .base import RGBDDataset
from .augmentation import RGBDAugmentor
from .rgbd_utils import loadtum, all_pairs_distance_matrix, compute_distance_matrix_flow
from .factory import dataset_factory

__all__ = [k for k in dir() if not k.startswith("_")]
