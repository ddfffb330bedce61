"""DroidNet container + unrolled training forward (reference droid_net.py:146-224)."""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ba import BA
from ..geom import coords_grid, projective_transform
from ..ops import build_pyramid, corr_lookup_pyramid, corr_volume
from .extractor import BasicEncoder
from .update import UpdateModule, upsample_disp

# ImageNet normalization (reference droid_net.py:160-163)
IMAGE_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGE_STD = jnp.array([0.229, 0.224, 0.225])


def normalize_images(images):
    """BGR [B, N, H, W, 3] in [0, 255] -> normalized RGB (reference :156-163)."""
    x = images[..., ::-1] / 255.0
    return (x - IMAGE_MEAN) / IMAGE_STD


class DroidNet(nn.Module):
    """fnet + cnet + update operator (reference droid_net.py:146-153).

    remat: checkpoint each unrolled iteration (corr lookup + GRU update +
    2x BA) so backprop stores only the per-iteration carry instead of every
    intermediate activation — O(1) instead of O(num_steps) activation
    memory, at the cost of one extra forward per iteration.  This is how
    the reference's 15-step training unroll (train.py:155-159, sized for
    24 GB GPUs) fits v5e-class HBM.

    scan: roll the iterations into one lax.scan so XLA compiles the body
    ONCE instead of num_steps times (the unrolled 15-iteration module takes
    ~8 min to compile on the chip; scanned, under a minute).  Numerics are
    identical; combine with remat for the standard TPU remat-scan training
    pattern.
    """
    dtype: jnp.dtype = None
    remat: bool = False
    scan: bool = False

    def setup(self):
        self.fnet = BasicEncoder(output_dim=128, norm_fn="instance", dtype=self.dtype)
        self.cnet = BasicEncoder(output_dim=256, norm_fn="none", dtype=self.dtype)
        self.update = UpdateModule(dtype=self.dtype)

    def extract_features(self, images):
        """images [B, N, H, W, 3] (BGR, 0-255) -> fmaps, net, inp at 1/8 res."""
        B, N, H, W, C = images.shape
        x = normalize_images(images).reshape(B * N, H, W, C).astype(self.dtype or jnp.float32)
        fmaps = self.fnet(x).reshape(B, N, H // 8, W // 8, -1)
        ctx = self.cnet(x).reshape(B, N, H // 8, W // 8, -1)
        net, inp = jnp.split(ctx, 2, axis=-1)
        return fmaps, jnp.tanh(net), nn.relu(inp)

    def __call__(self, Gs, images, disps, intrinsics, ii, jj, num_steps=12, fixedp=2,
                 edge_mask=None):
        """Unrolled training forward (reference droid_net.py:174-224).

        Gs: [B, P, 7]; images: [B, P, H, W, 3]; disps: [B, P, H/8, W/8];
        intrinsics: [B, P, 4] (at 1/8 res); ii/jj: edge lists.
        edge_mask: optional [E] float validity — lets per-step SAMPLED frame
        graphs (reference train.py:88-94) run under one jit signature by
        padding to a fixed edge count: masked edges get zero BA weight, are
        excluded from the per-frame GraphAgg scatter-mean (padded edges
        aggregate into a discarded extra segment), and produce zero
        residuals.
        Returns (Gs_list, disp_up_list, residual_list) per iteration.
        """
        B, P = images.shape[:2]
        fmaps, net, inp = self.extract_features(images)
        net, inp = net[:, ii], inp[:, ii]

        if edge_mask is not None:
            kk_agg = jnp.where(edge_mask.astype(bool), ii, P)
            num_seg = P + 1
            w_mask = edge_mask[None, :, None, None, None]
        else:
            kk_agg, num_seg, w_mask = ii, P, None

        # per-edge correlation pyramid
        f1 = fmaps[:, ii].reshape((-1,) + fmaps.shape[2:])
        f2 = fmaps[:, jj].reshape((-1,) + fmaps.shape[2:])
        pyramid = build_pyramid(corr_volume(f1, f2), num_levels=4)

        ht, wd = disps.shape[-2:]
        coords0 = coords_grid(ht, wd)

        coords1, _ = projective_transform(Gs, disps, intrinsics, ii, jj)
        target = coords1

        def _iteration(mdl, pyramid, net, inp, Gs, disps, coords1, target,
                       intrinsics, w_mask_arr, kk_agg_arr):
            """One unrolled update iteration (reference droid_net.py:188-220).

            Pure in its array arguments so it can be wrapped in nn.remat;
            ii/jj/num_seg/fixedp are static closures.
            """
            Gs = jax.lax.stop_gradient(Gs)
            disps = jax.lax.stop_gradient(disps)
            coords1 = jax.lax.stop_gradient(coords1)
            target = jax.lax.stop_gradient(target)

            # motion features (reference :200-206)
            corr = corr_lookup_pyramid(
                pyramid, coords1.reshape((-1,) + coords1.shape[2:])
            ).reshape(coords1.shape[:-1] + (-1,))
            resd = target - coords1
            flow = coords1 - coords0
            motion = jnp.clip(jnp.concatenate([flow, resd], axis=-1), -64.0, 64.0)

            net, delta, weight, eta, upmask = mdl(
                net, inp, corr.astype(net.dtype), motion.astype(net.dtype),
                kk=kk_agg_arr, num_segments=num_seg,
            )
            eta = eta[:, :P]
            upmask = upmask[:, :P]

            target = coords1 + delta.astype(jnp.float32)
            weight_f = weight.astype(jnp.float32)
            if w_mask is not None:
                weight_f = weight_f * w_mask_arr
            eta_f = eta.astype(jnp.float32)

            for _ in range(2):
                Gs, disps = BA(
                    target, weight_f, eta_f, Gs, disps, intrinsics, ii, jj,
                    fixedp=fixedp,
                )

            coords1, valid_mask = projective_transform(Gs, disps, intrinsics, ii, jj)
            residual = target - coords1
            if w_mask is not None:
                residual = residual * w_mask_arr
            disp_up = upsample_disp(disps, upmask.astype(jnp.float32))
            return (net, Gs, disps, coords1, target,
                    disp_up, valid_mask * residual)

        iteration = nn.remat(_iteration) if self.remat else _iteration
        w_mask_arr = (w_mask if w_mask is not None
                      else jnp.zeros((1, 1, 1, 1, 1), jnp.float32))
        kk_agg_arr = jnp.asarray(kk_agg)

        if self.scan:
            def body(mdl, carry, _):
                net, Gs, disps, coords1, target = carry
                (net, Gs, disps, coords1, target, disp_up, residual) = \
                    iteration(mdl, pyramid, net, inp, Gs, disps, coords1,
                              target, intrinsics, w_mask_arr, kk_agg_arr)
                return (net, Gs, disps, coords1, target), (Gs, disp_up, residual)

            scan_fn = nn.scan(
                body, variable_broadcast="params",
                split_rngs={"params": False}, length=num_steps,
            )
            _, (Gs_s, disp_s, res_s) = scan_fn(
                self.update, (net, Gs, disps, coords1, target), None)
            return (list(Gs_s), list(disp_s), list(res_s))

        Gs_list, disp_list, residual_list = [], [], []
        for _ in range(num_steps):
            (net, Gs, disps, coords1, target, disp_up, residual) = iteration(
                self.update, pyramid, net, inp, Gs, disps, coords1, target,
                intrinsics, w_mask_arr, kk_agg_arr,
            )
            Gs_list.append(Gs)
            disp_list.append(disp_up)
            residual_list.append(residual)

        return Gs_list, disp_list, residual_list
