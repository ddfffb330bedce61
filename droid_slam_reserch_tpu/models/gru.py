"""ConvGRU with global context branch (reference droid_slam/modules/gru.py)."""
import flax.linen as nn
import jax.numpy as jnp

from .layers import tconv


class ConvGRU(nn.Module):
    """3x3 ConvGRU; a sigmoid-gated spatial mean of the hidden state feeds
    1x1 convs added to the z/r/q gates (reference gru.py:19-32).

    net: [B, H, W, h_planes]; inputs concatenated along channels.
    """
    h_planes: int = 128
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, net, *inputs):
        inp = jnp.concatenate(inputs, axis=-1)
        net_inp = jnp.concatenate([net, inp], axis=-1)

        glo = nn.sigmoid(tconv(self.h_planes, 1, padding=0, name="w", dtype=self.dtype)(net)) * net
        glo = jnp.mean(glo, axis=(1, 2), keepdims=True)  # [B,1,1,C]

        # z and r read the same input: one fused conv with 2x output
        # channels halves the conv-call count on the hot path (the weights
        # are the reference's convz/convr stacked along output channels —
        # models/convert.py:_fuse_gru_zr)
        zr = (
            tconv(2 * self.h_planes, 3, name="convzr", dtype=self.dtype)(net_inp)
            + tconv(2 * self.h_planes, 1, padding=0, name="convzr_glo", dtype=self.dtype)(glo)
        )
        z = nn.sigmoid(zr[..., : self.h_planes])
        r = nn.sigmoid(zr[..., self.h_planes :])
        q = nn.tanh(
            tconv(self.h_planes, 3, name="convq", dtype=self.dtype)(
                jnp.concatenate([r * net, inp], axis=-1)
            )
            + tconv(self.h_planes, 1, padding=0, name="convq_glo", dtype=self.dtype)(glo)
        )
        return (1 - z) * net + z * q
