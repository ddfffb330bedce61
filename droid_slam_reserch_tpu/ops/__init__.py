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

__all__ = [k for k in dir() if not k.startswith("_")]
