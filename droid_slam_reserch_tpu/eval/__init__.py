"""Trajectory evaluation: ATE/RPE with Umeyama alignment.

Replaces the reference's external evaluators (evo APE calls in
evaluation_scripts/test_euroc.py:123-145 and the tartanair_tools
ATE/RPE/KITTI metrics, SURVEY.md §2.6/L7) with a self-contained
implementation.
"""
from .metrics import (
    umeyama_alignment,
    ate_rmse,
    rpe,
    evaluate_ate,
    evaluate_tartanair,
    kitti_metrics,
    tum_trajectory_to_matrix,
)

__all__ = [k for k in dir() if not k.startswith("_")]
