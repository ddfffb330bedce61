"""Non-keyframe pose recovery (reference trajectory_filler.py:12-103).

Chunks of 16 frames: linear SE3 interpolation between bracketing keyframes,
fnet features only, temporary append + edges to brackets, 6 motion-only BA
iterations, pop.
"""
import jax.numpy as jnp
import numpy as np

from ..lie import se3_exp, se3_inv, se3_log, se3_mul
from .factor_graph import FactorGraph


class TrajectoryFiller:
    def __init__(self, applies, params, video, config, dtype=None):
        self.applies = applies
        self.params = params
        self.video = video
        self.cfg = config
        self.dtype = dtype or jnp.float32

    def _fill(self, tstamps, images, intrinsics):
        """Fill one chunk (reference :35-77)."""
        v = self.video
        N = v.counter
        M = len(tstamps)

        ts = v.tstamp[:N]
        Ps = v.poses[:N]

        t0 = np.array([np.sum(ts <= t) - 1 for t in tstamps])
        t0 = np.clip(t0, 0, N - 1)
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        dt = jnp.asarray(ts[t1] - ts[t0] + 1e-3, jnp.float32)[:, None]
        dP = se3_mul(Ps[jnp.asarray(t1)], se3_inv(Ps[jnp.asarray(t0)]))
        vlog = se3_log(dP) / dt
        w = vlog * jnp.asarray(
            np.asarray(tstamps, np.float64) - ts[t0], jnp.float32
        )[:, None]
        Gs = se3_mul(se3_exp(w), Ps[jnp.asarray(t0)])

        # fnet features only (reference :60-62); all cams for stereo buffers
        imgs = np.stack([im if im.ndim == 4 else im[None] for im in images])  # [M,c,H,W,3]
        Mc = imgs.shape[1]
        fmaps = self.applies["fnet"](
            self.params, jnp.asarray(imgs.reshape((-1,) + imgs.shape[2:]), jnp.float32)
        )
        fmaps = fmaps.reshape((M, Mc) + fmaps.shape[1:])

        for m in range(M):
            v.set_slot(
                N + m, tstamps[m], imgs[m, 0], Gs[m], None, None,
                jnp.asarray(intrinsics[m]) / 8.0, fmaps[m],
            )
        v.counter = N + M

        graph = FactorGraph(v, self.applies["update"], self.params, dtype=self.dtype)
        graph.add_factors(t0, np.arange(N, N + M))
        graph.add_factors(t1, np.arange(N, N + M))

        # 6 motion-only (GRU + MoBA) rounds fused into ONE device program —
        # the reference (and the round-3 build) dispatched each round
        # separately (reference trajectory_filler.py:67-72), paying ~12
        # host round-trips per 16-frame chunk; parity with the sequential
        # path is tested (tests/test_engine.py)
        graph.update_fused(6, t0=N, t1=N + M, use_inactive=False,
                           motion_only=True)

        out = np.asarray(v.poses[N : N + M])
        v.counter = N
        return out

    def __call__(self, image_stream):
        """Interpolate all non-keyframe poses (reference :79-103).

        image_stream yields (tstamp, image, intrinsics).  Returns [T, 7]
        camera-to-world? No: world-to-camera poses like video.poses; callers
        invert for trajectories (reference droid.py:146).
        """
        pose_list, tstamps, images, intrinsics = [], [], [], []
        for (tstamp, image, intrinsic) in image_stream:
            tstamps.append(tstamp)
            images.append(np.asarray(image))
            intrinsics.append(np.asarray(intrinsic))
            if len(tstamps) == 16:
                pose_list.append(self._fill(tstamps, images, intrinsics))
                tstamps, images, intrinsics = [], [], []
        if tstamps:
            pose_list.append(self._fill(tstamps, images, intrinsics))
        return np.concatenate(pose_list, axis=0)
