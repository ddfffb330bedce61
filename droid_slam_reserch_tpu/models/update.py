"""Recurrent update operator + graph aggregation + convex upsampling.

Reference droid_slam/droid_net.py:21-143 (cvx_upsample, GraphAgg,
UpdateModule).  All tensors NHWC; edges are flattened into the batch dim for
the convolutions and vmapped trivially across devices (SURVEY.md §2.7).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from .gru import ConvGRU
from .layers import gradient_clip, tconv


def cvx_upsample(data, mask):
    """Mask-weighted 8x convex upsampling (reference droid_net.py:21-35).

    data: [B, H, W, C]; mask: [B, H, W, 8*8*9] (conv output, torch channel
    order k*64 + sy*8 + sx).  Returns [B, 8H, 8W, C].
    """
    B, H, W, C = data.shape
    mask = mask.reshape(B, H, W, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    padded = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [padded[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W] for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        axis=3,
    )  # [B,H,W,9,C], k = (dy+1)*3 + (dx+1) matching F.unfold ordering

    up = jnp.einsum("bhwkyx,bhwkc->bhwyxc", mask, patches)  # [B,H,W,8,8,C]
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, C)
    return up


def upsample_disp(disp, mask):
    """disp: [B, N, H, W]; mask: [B, N, H, W, 576] -> [B, N, 8H, 8W]."""
    B, N, H, W = disp.shape
    up = cvx_upsample(disp.reshape(B * N, H, W, 1), mask.reshape(B * N, H, W, -1))
    return up.reshape(B, N, 8 * H, 8 * W)


class GraphAgg(nn.Module):
    """Per-keyframe aggregation of edge hidden states (reference :44-75).

    net: [B, N, H, W, 128] edge states; kk: [N] segment id (edge -> source
    frame slot); num_segments: static segment count; emask: optional [N]
    edge validity — masked (padded) edges are excluded from the per-frame
    mean, matching the reference's scatter over real edges only.  Returns
    per-frame damping eta [B, M, H, W] and upsampling mask
    [B, M, H, W, 576].
    """
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, net, kk, num_segments, emask=None):
        B, N, H, W, C = net.shape
        x = nn.relu(tconv(128, 3, name="conv1", dtype=self.dtype)(net.reshape(B * N, H, W, C)))
        x = x.reshape(B, N, H, W, 128)

        # scatter_mean over edges by source frame (reference :63-67) as a
        # one-hot MXU contraction — TPU scatter-adds serialize, the matmul
        # rides the MXU and fuses with the surrounding convs
        onehot = (
            jnp.asarray(kk)[None, :] == jnp.arange(num_segments)[:, None]
        ).astype(x.dtype)  # [M, N]
        if emask is not None:
            onehot = onehot * jnp.asarray(emask, x.dtype)[None, :]
        sums = jnp.einsum(
            "mn,bnhwc->bmhwc", onehot, x, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        counts = jnp.sum(onehot, axis=1)
        mean = sums / jnp.maximum(counts, 1.0)[None, :, None, None, None]

        M = num_segments
        y = nn.relu(tconv(128, 3, name="conv2", dtype=self.dtype)(mean.reshape(B * M, H, W, 128)))

        eta = nn.softplus(gradient_clip(tconv(1, 3, name="eta0", dtype=self.dtype)(y)))
        upmask = tconv(8 * 8 * 9, 1, padding=0, name="upmask0", dtype=self.dtype)(y)

        eta = 0.01 * eta.reshape(B, M, H, W)
        upmask = upmask.reshape(B, M, H, W, 8 * 8 * 9)
        return eta, upmask


class UpdateModule(nn.Module):
    """The RAFT-SLAM recurrent operator (reference droid_net.py:78-143).

    net/inp: [B, N, H, W, 128]; corr: [B, N, H, W, 196];
    flow: [B, N, H, W, 4] motion features.  Returns updated net, flow
    correction delta [B,N,H,W,2], confidence weight [B,N,H,W,2], and — when
    kk/num_segments are given — (eta, upmask) from GraphAgg.
    """
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, net, inp, corr, flow=None, kk=None, num_segments=None,
                 emask=None):
        B, N, H, W, _ = net.shape
        if flow is None:
            flow = jnp.zeros((B, N, H, W, 4), net.dtype)

        def flat(x):
            return x.reshape(B * N, H, W, x.shape[-1])

        net_f, inp_f, corr_f, flow_f = flat(net), flat(inp), flat(corr), flat(flow)

        c = nn.relu(tconv(128, 1, padding=0, name="corr_enc1", dtype=self.dtype)(corr_f))
        c = nn.relu(tconv(128, 3, name="corr_enc2", dtype=self.dtype)(c))

        f = nn.relu(tconv(128, 7, padding=3, name="flow_enc1", dtype=self.dtype)(flow_f))
        f = nn.relu(tconv(64, 3, name="flow_enc2", dtype=self.dtype)(f))

        net_f = ConvGRU(128, name="gru", dtype=self.dtype)(net_f, inp_f, c, f)

        d = nn.relu(tconv(128, 3, name="delta1", dtype=self.dtype)(net_f))
        delta = gradient_clip(tconv(2, 3, name="delta2", dtype=self.dtype)(d))

        w = nn.relu(tconv(128, 3, name="weight1", dtype=self.dtype)(net_f))
        weight = nn.sigmoid(gradient_clip(tconv(2, 3, name="weight2", dtype=self.dtype)(w)))

        net = net_f.reshape(B, N, H, W, 128)
        delta = delta.reshape(B, N, H, W, 2)
        weight = weight.reshape(B, N, H, W, 2)

        if kk is not None:
            eta, upmask = GraphAgg(name="agg", dtype=self.dtype)(
                net, kk, num_segments, emask
            )
            return net, delta, weight, eta, upmask
        return net, delta, weight
