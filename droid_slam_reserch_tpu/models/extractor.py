"""Feature/context encoders (reference droid_slam/modules/extractor.py).

BasicEncoder: conv7x7/s2 -> 3 residual stages (dims 32/64/128, strides
1/2/2) -> 1x1 output conv; overall stride 8 (reference extractor.py:119-224).
fnet uses instance norm (no affine params), cnet uses no norm
(reference droid_net.py:150-152) — so neither carries norm parameters and
group/batch norm variants are provided for architectural parity only.
"""
import flax.linen as nn
import jax.numpy as jnp

from .layers import instance_norm, tconv

DIM = 32


def _norm(x, norm_fn, num_groups):
    if norm_fn == "instance":
        return instance_norm(x)
    if norm_fn == "none":
        return x
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=num_groups)(x)
    raise ValueError(f"unsupported norm_fn: {norm_fn}")


class ResidualBlock(nn.Module):
    """Two 3x3 convs + skip (reference extractor.py:7-56)."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        ng = self.planes // 8
        y = tconv(self.planes, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(_norm(y, self.norm_fn, ng))
        y = tconv(self.planes, 3, 1, name="conv2", dtype=self.dtype)(y)
        y = nn.relu(_norm(y, self.norm_fn, ng))
        if self.stride != 1:
            x = tconv(self.planes, 1, self.stride, padding=0, name="downsample", dtype=self.dtype)(x)
            x = _norm(x, self.norm_fn, ng)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (reference extractor.py:59-114)."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        ng = self.planes // 8
        y = tconv(self.planes // 4, 1, 1, padding=0, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(_norm(y, self.norm_fn, ng))
        y = tconv(self.planes // 4, 3, self.stride, name="conv2", dtype=self.dtype)(y)
        y = nn.relu(_norm(y, self.norm_fn, ng))
        y = tconv(self.planes, 1, 1, padding=0, name="conv3", dtype=self.dtype)(y)
        y = nn.relu(_norm(y, self.norm_fn, ng))
        if self.stride != 1:
            x = tconv(self.planes, 1, self.stride, padding=0, name="downsample", dtype=self.dtype)(x)
            x = _norm(x, self.norm_fn, ng)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Stride-8 residual encoder (reference extractor.py:119-224).

    Input [B, H, W, 3] -> [B, H/8, W/8, output_dim].
    """
    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        x = tconv(DIM, 7, 2, padding=3, name="conv1", dtype=self.dtype)(x)
        x = nn.relu(_norm(x, self.norm_fn, 8))

        for li, (dim, stride) in enumerate([(DIM, 1), (2 * DIM, 2), (4 * DIM, 2)], start=1):
            x = ResidualBlock(dim, self.norm_fn, stride, name=f"layer{li}_0", dtype=self.dtype)(x)
            x = ResidualBlock(dim, self.norm_fn, 1, name=f"layer{li}_1", dtype=self.dtype)(x)

        x = tconv(self.output_dim, 1, 1, padding=0, name="conv2", dtype=self.dtype)(x)
        return x
