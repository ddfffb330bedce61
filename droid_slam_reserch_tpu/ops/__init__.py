"""Correlation ops: all-pairs volumes + radius lookup, and fused on-the-fly
correlation (the reference's corr_index / altcorr CUDA kernels, TPU-native).
"""
from .corr import (
    corr_volume,
    build_pyramid,
    pool2x_volume,
    pool2x_fmap,
    corr_lookup,
    corr_lookup_pyramid,
    pack_pyramid,
    packed_lookup,
    altcorr,
    altcorr_pyramid,
)
from .pallas_corr import (
    corr_build_pmajor_pallas,
    corr_build_windows_pallas,
    corr_build_windows_light_pallas,
    corr_extract_windows_pallas,
    corr_lookup_blocked_pallas,
    corr_lookup_pmajor_pallas,
    corr_lookup_windows_pallas,
    window_drift_ok_pallas,
)
from .pallas_ba import build_system_blocks_pallas

__all__ = [k for k in dir() if not k.startswith("_")]
