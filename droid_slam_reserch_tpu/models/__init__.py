"""Learned components (Flax/linen, NHWC, bf16-friendly).

TPU-native mirror of reference droid_slam/modules/ + droid_net.py:
feature/context encoders, ConvGRU update operator with per-edge aggregation,
convex upsampling, and the DroidNet container with the unrolled training
forward.  A converter ingests the reference's droid.pth torch checkpoints.
"""
from .layers import gradient_clip, instance_norm
from .extractor import BasicEncoder, ResidualBlock, BottleneckBlock
from .gru import ConvGRU
from .update import UpdateModule, GraphAgg, cvx_upsample, upsample_disp
from .droidnet import DroidNet
from .convert import convert_torch_checkpoint, load_torch_checkpoint

__all__ = [k for k in dir() if not k.startswith("_")]
