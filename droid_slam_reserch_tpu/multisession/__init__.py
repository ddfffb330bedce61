"""Multisession map fusion (the fork's core contribution, SURVEY.md §3.4).

Stages (reference Euroc_Multisession_Stereo/ + droid_slam/loop_detect.py):
1. per-session stereo SLAM -> session checkpoint (keyframes + caches)
2. SE3 map-to-map alignment via seeded "loop" replay sessions + IQR-filtered
   mean transform, then joint backend over the concatenated pair
3. global fusion: concatenate all transformed maps (subsampled) + global BA
4. evaluation: inject fused keyframes per sequence, fill non-keyframe poses,
   concatenated ATE
"""
from .group_sequence import parse_group_sequence
from .alignment import (
    compute_filtered_mean,
    estimate_alignment,
    normalize_transform,
    transform_poses,
    remove_outlier_rows,
)
from .pipeline import (
    run_loop_session,
    align_pair,
    joint_backend,
    fuse_maps,
    evaluate_fused_map,
)

__all__ = [k for k in dir() if not k.startswith("_")]
