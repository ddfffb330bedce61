"""Keyframe admission by flow magnitude (reference motion_filter.py:12-98)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import se3_identity
from ..ops import build_pyramid, corr_lookup_pyramid, corr_volume


@partial(jax.jit,
         static_argnames=("fnet_apply", "cnet_apply", "update_apply", "dtype"))
def _fused_track(fnet_apply, cnet_apply, update_apply, params, imgs,
                 fmap_prev, net_prev, inp_prev, thresh, dtype=jnp.float32):
    """The whole steady-state filter as ONE device program: fnet features,
    the 1-step update-op motion check against the last keyframe (reference
    motion_filter.py:81-91 — corr of the static grid, 1 GRU step, no BA),
    and the context features for admission.

    The reference runs fnet / the check / cnet as three separate kernels
    per frame; here they fuse so the admission decision costs a single
    dispatch + a single host sync on ``delta_norm``, and the cnet branch
    only executes (lax.cond) when the frame will actually be admitted.
    Returns (gmap, net0, inp0, delta_norm).
    """
    gmap = fnet_apply(params, imgs)

    h8, w8 = gmap.shape[1:3]
    ys, xs = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                          jnp.arange(w8, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.stack([xs, ys], axis=-1)[None]

    pyr = build_pyramid(corr_volume(fmap_prev[None], gmap[:1]), num_levels=4)
    corr = corr_lookup_pyramid(pyr, coords0)
    _, delta, _ = update_apply(
        params, net_prev[None, None], inp_prev[None, None],
        corr[None].astype(dtype), None,
    )
    delta_norm = jnp.mean(jnp.linalg.norm(delta[0, 0], axis=-1))

    def admit(_):
        net, inp = cnet_apply(params, imgs[:1])
        return net[0], inp[0]

    def skip(_):
        return net_prev, inp_prev  # discarded by the host on skip

    net0, inp0 = jax.lax.cond(delta_norm > thresh, admit, skip, None)
    return gmap, net0, inp0, delta_norm


class MotionFilter:
    """Filters incoming frames; appends keyframes with enough motion."""

    def __init__(self, applies, params, video, thresh=2.4, dtype=jnp.float32):
        self.applies = applies
        self.params = params
        self.video = video
        self.thresh = thresh
        self.dtype = dtype
        self.count = 0
        self.fmap = None
        self.net = None
        self.inp = None

    def track(self, tstamp, image, depth=None, intrinsics=None):
        from ..utils.timing import section

        with section("motion_filter.track"):
            return self._track(tstamp, image, depth, intrinsics)

    def _track(self, tstamp, image, depth=None, intrinsics=None):
        """Process one input frame (reference motion_filter.py:51-98).

        image: [H, W, 3] uint8 BGR, or [2, H, W, 3] for stereo.
        """
        video = self.video
        if image.ndim == 3:
            image = image[None]
        imgs = jnp.asarray(np.asarray(image, np.float32))

        if video.counter == 0:
            gmap = self.applies["fnet"](self.params, imgs)
            net, inp = self.applies["cnet"](self.params, imgs[:1])
            self.net, self.inp, self.fmap = net[0], inp[0], gmap
            video.append(
                tstamp, image[0], se3_identity(), 1.0, depth,
                jnp.asarray(intrinsics) / 8.0, gmap, net[0], inp[0],
            )
        else:
            gmap, net0, inp0, delta_norm = _fused_track(
                self.applies["fnet"], self.applies["cnet"],
                self.applies["update"], self.params, imgs,
                self.fmap[0], self.net, self.inp,
                jnp.float32(self.thresh), dtype=self.dtype,
            )
            from ..utils.timing import count_sync

            count_sync()  # admission decision: the per-frame blocking sync
            if float(delta_norm) > self.thresh:
                self.count = 0
                self.net, self.inp, self.fmap = net0, inp0, gmap
                video.append(
                    tstamp, image[0], None, None, depth,
                    jnp.asarray(intrinsics) / 8.0, gmap, net0, inp0,
                )
            else:
                self.count += 1


class SessionMotionFilter(MotionFilter):
    """Multisession variant: the first frame keeps a preloaded pose/disp
    (reference s_motion_filter.py:78-80 — pose=None/disp=None on frame 0 so
    seeded buffers survive)."""

    def track(self, tstamp, image, depth=None, intrinsics=None):
        video = self.video
        if video.counter == 0:
            if image.ndim == 3:
                image = image[None]
            imgs = jnp.asarray(np.asarray(image, np.float32))
            gmap = self.applies["fnet"](self.params, imgs)
            net, inp = self.applies["cnet"](self.params, imgs[:1])
            self.net, self.inp, self.fmap = net[0], inp[0], gmap
            video.append(
                tstamp, image[0], None, None, depth,
                jnp.asarray(intrinsics) / 8.0, gmap, net[0], inp[0],
            )
        else:
            super().track(tstamp, image, depth, intrinsics)
