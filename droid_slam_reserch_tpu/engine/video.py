"""Keyframe buffer — the DepthVideo analog (reference depth_video.py:12-222).

Differences by design (SURVEY.md §7):
- buffers are JAX device arrays updated through donated jit setters (true
  in-place on device) instead of shared-memory torch tensors;
- the BA entry point ``ba`` computes a *local window* around the active
  edges, pads window/edge/degree sizes to buckets, and calls the
  static-shape ``ba_solve`` — the jit cache stays small and stable;
- images stay on the host (visualization/export only).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ba.solver import ba_solve, schur_pairs
from ..geom import frame_distance, projective_transform
from ..lie import se3_identity
from ..utils.config import resolve_pallas_ba
from ..models.update import cvx_upsample


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.jit, donate_argnums=(0,))
def _set_slot(buf, idx, val):
    return buf.at[idx].set(val)


@partial(jax.jit, donate_argnums=(0,))
def _set_range(buf, start, val):
    return jax.lax.dynamic_update_slice_in_dim(buf, val, start, axis=0)


@partial(jax.jit, donate_argnums=(0,))
def _shift_down(buf, ix):
    """buf[ix] = buf[ix+1] (keyframe removal, reference factor_graph.py:165-178)."""
    return buf.at[ix].set(buf[ix + 1])


_DIST_CHUNK = 1024


@partial(jax.jit, static_argnames=("beta",))
def _distance_chunked(poses, disps, intrinsics, ii, jj, beta):
    """frame_distance over padded pair chunks (bounds peak memory)."""
    def body(carry, pair):
        ci, cj = pair
        d = frame_distance(poses, disps, intrinsics, ci, cj, beta=beta)
        return carry, d

    n = ii.shape[0]
    ii = ii.reshape(-1, _DIST_CHUNK)
    jj = jj.reshape(-1, _DIST_CHUNK)
    _, out = jax.lax.scan(body, None, (ii, jj))
    return out.reshape(-1)[:n]


class Video:
    """Fixed-capacity keyframe state (reference depth_video.py:12-49)."""

    def __init__(self, config):
        self.cfg = config
        ht, wd = config.image_size
        self.ht, self.wd = ht, wd
        h8, w8 = ht // 8, wd // 8
        self.h8, self.w8 = h8, w8
        buf = config.buffer
        self.stereo = config.stereo
        c = 2 if config.stereo else 1
        fdt = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32

        self.counter = 0
        self.tstamp = np.zeros(buf, dtype=np.float64)
        self.images = np.zeros((buf, ht, wd, 3), dtype=np.uint8)  # host-side
        self.dirty = np.zeros(buf, dtype=bool)

        self.poses = jnp.broadcast_to(se3_identity(), (buf, 7)).copy()
        self.disps = jnp.ones((buf, h8, w8), jnp.float32)
        self.disps_sens = jnp.zeros((buf, h8, w8), jnp.float32)
        self.disps_up = None  # allocated lazily when upsampling is enabled
        self.intrinsics = jnp.zeros((buf, 4), jnp.float32)
        self.damping = 1e-6 * jnp.ones((buf, h8, w8), jnp.float32)

        self.fmaps = jnp.zeros((buf, c, h8, w8, 128), fdt)
        self.nets = jnp.zeros((buf, h8, w8, 128), fdt)
        self.inps = jnp.zeros((buf, h8, w8, 128), fdt)

    # ------------------------------------------------------------------ state

    def append(self, tstamp, image, pose, disp, depth, intrinsics, fmap, net=None, inp=None):
        """Add a keyframe at slot ``counter`` (reference depth_video.py:56-114).

        image: [ht, wd, 3] uint8 (host); pose: [7] or None; disp: scalar/[h8,w8]
        or None; depth: full-res depth [ht, wd] or None (RGB-D);
        fmap: [c, h8, w8, 128]; net/inp: [h8, w8, 128].
        """
        ix = self.counter
        self.set_slot(ix, tstamp, image, pose, disp, depth, intrinsics, fmap, net, inp)
        self.counter = ix + 1

    def set_slot(self, ix, tstamp, image, pose, disp, depth, intrinsics, fmap, net=None, inp=None):
        self.tstamp[ix] = tstamp
        if image is not None:
            self.images[ix] = np.asarray(image, dtype=np.uint8)
        self.dirty[ix] = True
        if pose is not None:
            self.poses = _set_slot(self.poses, ix, jnp.asarray(pose, jnp.float32))
        if disp is not None:
            d = jnp.broadcast_to(jnp.asarray(disp, jnp.float32), (self.h8, self.w8))
            self.disps = _set_slot(self.disps, ix, d)
        if depth is not None:
            depth = jnp.asarray(depth)[3::8, 3::8]
            dsens = jnp.where(depth > 0, 1.0 / jnp.maximum(depth, 1e-8), 0.0)
            self.disps_sens = _set_slot(self.disps_sens, ix, dsens.astype(jnp.float32))
        if intrinsics is not None:
            self.intrinsics = _set_slot(self.intrinsics, ix, jnp.asarray(intrinsics, jnp.float32))
        if fmap is not None:
            fmap = jnp.asarray(fmap, self.fmaps.dtype)
            c = self.fmaps.shape[1]
            if fmap.shape[0] != c:  # mono features into a stereo buffer
                fmap = jnp.broadcast_to(fmap[:1], (c,) + fmap.shape[1:]) if fmap.shape[0] == 1 else fmap[:c]
            self.fmaps = _set_slot(self.fmaps, ix, fmap)
        if net is not None:
            self.nets = _set_slot(self.nets, ix, jnp.asarray(net, self.nets.dtype))
        if inp is not None:
            self.inps = _set_slot(self.inps, ix, jnp.asarray(inp, self.inps.dtype))

    def remove_keyframe(self, ix):
        """Shift slot ix+1 down into ix (reference factor_graph.py:165-178)."""
        self.tstamp[ix] = self.tstamp[ix + 1]
        self.images[ix] = self.images[ix + 1]
        for name in ("poses", "disps", "disps_sens", "intrinsics", "fmaps", "nets", "inps", "damping"):
            setattr(self, name, _shift_down(getattr(self, name), ix))

    def normalize(self):
        """Mono gauge fix: scale by mean disparity (reference depth_video.py:140-147)."""
        t = self.counter
        s = jnp.mean(self.disps[:t])
        self.disps = _set_range(self.disps, 0, self.disps[:t] / s)
        scaled = self.poses[:t].at[:, :3].multiply(s)
        self.poses = _set_range(self.poses, 0, scaled)
        self.dirty[:t] = True

    # -------------------------------------------------------------- geometry

    def reproject(self, ii, jj):
        """coords, valid for edges ii->jj (reference depth_video.py:150-158)."""
        ii = jnp.asarray(ii, jnp.int32)
        jj = jnp.asarray(jj, jnp.int32)
        coords, valid = projective_transform(
            self.poses[None], self.disps[None], self.intrinsics[None], ii, jj
        )
        return coords, valid

    def distance(self, ii, jj, beta=0.3, bidirectional=True):
        """Mean-flow frame distance (reference depth_video.py:160-190)."""
        ii = np.asarray(ii, dtype=np.int32).reshape(-1)
        jj = np.asarray(jj, dtype=np.int32).reshape(-1)
        n = len(ii)
        intr = self.intrinsics[0]
        b = self.cfg.beta if beta is None else beta
        if bidirectional:
            # both directions ride ONE padded dispatch (the per-call launch
            # is what dominates host-side; reference runs two kernels,
            # depth_video.py:171-182)
            ii2 = np.concatenate([ii, jj])
            jj2 = np.concatenate([jj, ii])
            pad = _round_up(max(2 * n, 1), _DIST_CHUNK) - 2 * n
            iip = jnp.asarray(np.concatenate([ii2, np.zeros(pad, np.int32)]))
            jjp = jnp.asarray(np.concatenate([jj2, np.zeros(pad, np.int32)]))
            d = _distance_chunked(self.poses, self.disps, intr, iip, jjp, b)
            return np.asarray(0.5 * (d[:n] + d[n : 2 * n]))
        pad = _round_up(max(n, 1), _DIST_CHUNK) - n
        iip = jnp.asarray(np.concatenate([ii, np.zeros(pad, np.int32)]))
        jjp = jnp.asarray(np.concatenate([jj, np.zeros(pad, np.int32)]))
        d = _distance_chunked(self.poses, self.disps, intr, iip, jjp, b)
        return np.asarray(d[:n])

    def distance_matrix_async(self, t0, t1, t, beta=0.3):
        """Dispatch the pairwise bidirectional distance matrix [t0,t) x
        [t1,t) WITHOUT syncing; returns a lazy device array.

        The frontend prefetches the next keyframe's proximity matrix with
        this at the end of each update (its inputs — poses/disps — cannot
        change before the next keyframe arrives), so the per-keyframe
        host sync the reference pays for edge selection
        (factor_graph.py:326) becomes an overlapped transfer."""
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)
        n = len(ii)
        b = self.cfg.beta if beta is None else beta
        ii2 = np.concatenate([ii, jj]).astype(np.int32)
        jj2 = np.concatenate([jj, ii]).astype(np.int32)
        pad = _round_up(max(2 * n, 1), _DIST_CHUNK) - 2 * n
        iip = jnp.asarray(np.concatenate([ii2, np.zeros(pad, np.int32)]))
        jjp = jnp.asarray(np.concatenate([jj2, np.zeros(pad, np.int32)]))
        d = _distance_chunked(self.poses, self.disps, self.intrinsics[0], iip, jjp, b)
        return (0.5 * (d[:n] + d[n : 2 * n])).reshape(len(ix), len(jx))

    def distance_matrix(self, t0, t1, t, beta=0.3):
        """Pairwise distances [t0,t) x [t1,t) (used by proximity edges).

        Bidirectional (mean of both flow directions) like the reference's
        default `video.distance(ii, jj, beta=beta)` call from proximity
        selection (reference depth_video.py:160-182, factor_graph.py:326).
        """
        return np.asarray(self.distance_matrix_async(t0, t1, t, beta=beta))

    # -------------------------------------------------------------------- BA

    def ba(self, target, weight, eta_win, ii, jj, t0, t1, iterations=2,
           lm=1e-4, ep=0.1, motion_only=False):
        """Windowed dense BA over [t0, t1) given per-edge target/weight.

        target/weight: [N, h8, w8, 2] device arrays (N = true edge count);
        eta_win: per-frame damping for the window [m0, t1) or None to use
        0.2 * video.damping + eps (reference factor_graph.py:234);
        ii/jj: global edge indices (host numpy).  Pads edges/window/degree
        to buckets so ba_solve's jit cache stays small.
        """
        from ..utils.timing import section

        with section("video.ba"):
            return self._ba(target, weight, eta_win, ii, jj, t0, t1,
                            iterations, lm, ep, motion_only)

    def _ba(self, target, weight, eta_win, ii, jj, t0, t1, iterations,
            lm, ep, motion_only):
        cfg = self.cfg
        ii = np.asarray(ii)
        jj = np.asarray(jj)
        n = len(ii)
        m0 = int(min(ii.min(), jj.min(), t0))
        MW = _round_up(t1 - m0, cfg.window_bucket)
        m0 = max(0, t1 - MW)
        MW = t1 - m0 if m0 == 0 else MW
        MW = _round_up(MW, cfg.window_bucket)

        n_pad = _round_up(n, cfg.edge_bucket)
        ii_l = np.zeros(n_pad, np.int32)
        jj_l = np.zeros(n_pad, np.int32)
        ii_l[:n] = ii - m0
        jj_l[:n] = jj - m0

        pad_shape = (n_pad - n, self.h8, self.w8, 2)
        target_p = jnp.concatenate([target, jnp.zeros(pad_shape, target.dtype)], axis=0)
        weight_p = jnp.concatenate([weight, jnp.zeros(pad_shape, weight.dtype)], axis=0)

        from ..native import bucket_tables

        be, bm = bucket_tables(ii_l[:n], MW)

        free = np.zeros(MW, dtype=bool)
        free[t0 - m0 : t1 - m0] = True

        sl = slice(m0, m0 + MW)
        if eta_win is None:
            eta = 0.2 * self.damping[sl] + cfg.damping_eps
        else:
            eta = eta_win

        shards = self._resolved_ba_shards(MW, motion_only)
        if shards > 1:
            poses_w, disps_w = self._ba_sharded(
                sl, MW, ii_l[:n], jj_l[:n], target_p[:n], weight_p[:n], eta,
                free, iterations, lm, ep, shards,
            )
            disps_w = jnp.maximum(disps_w, 0.001)
            self.poses = _set_range(self.poses, m0, poses_w)
            self.disps = _set_range(self.disps, m0, disps_w)
            return

        poses_w, disps_w = ba_solve(
            self.poses[sl], self.disps[sl], self.intrinsics[0],
            self.disps_sens[sl], target_p, weight_p, eta,
            jnp.asarray(ii_l), jnp.asarray(jj_l), jnp.asarray(free),
            jnp.asarray(be), jnp.asarray(bm),
            iterations=iterations, lm=lm, ep=ep, motion_only=motion_only,
            min_depth=cfg.min_depth, use_pallas=resolve_pallas_ba(cfg),
        )
        disps_w = jnp.maximum(disps_w, 0.001)  # reference depth_video.py:204
        self.poses = _set_range(self.poses, m0, poses_w)
        self.disps = _set_range(self.disps, m0, disps_w)

    def _resolved_ba_shards(self, MW, motion_only):
        """cfg.ba_shards with -1 = auto: shard large global-BA windows over
        every local device (frontend-sized windows and motion-only solves
        stay single-device — the pose-system exchange would dominate).

        Any MW >= n shards (ranges are edge-balanced, not equal-length);
        a decline other than "window too small / motion-only" is logged
        once so capability downgrades are never silent."""
        import jax

        from ..utils.log import log_once

        s = self.cfg.ba_shards
        if s == -1:
            n = jax.local_device_count()
            if n > 1 and not motion_only and MW >= 128:
                if MW >= n:
                    return n
                log_once(
                    f"ba_auto_shard_decline_{MW}_{n}",
                    f"auto BA sharding declined: window MW={MW} < {n} devices",
                )
            return 0
        if s > 1 and not motion_only:
            if MW >= s:
                return s
            log_once(
                f"ba_shard_decline_{MW}_{s}",
                f"BA sharding declined: window MW={MW} < ba_shards={s}",
            )
        return 0

    def _ba_sharded(self, sl, MW, ii_l, jj_l, target, weight, eta,
                    free, iterations, lm, ep, shards):
        """Keyframe-sharded distributed BA over a `kf` device mesh
        (SURVEY.md §2.7 map parallelism; parallel/dist_ba.py).  Depth
        buckets and their edges live shard-local; only the pose system is
        exchanged (block-sparse all_gathers)."""
        import jax

        from ..parallel import (
            dist_ba_solve, make_mesh, partition_edges, resolve_exchange,
        )

        cfg = self.cfg
        if getattr(self, "_kf_mesh", None) is None or self._kf_mesh.size != shards:
            self._kf_mesh = make_mesh(
                (shards,), ("kf",), devices=jax.devices()[:shards]
            )
        ii_s, jj_s, tgt_s, wgt_s, be_s, bm_s, k0_s, rlen_s = partition_edges(
            ii_l, jj_l, np.asarray(target), np.asarray(weight), MW,
            shards, edge_bucket=cfg.edge_bucket,
        )
        return dist_ba_solve(
            self._kf_mesh, self.poses[sl], self.disps[sl], self.intrinsics[0],
            self.disps_sens[sl], jnp.asarray(tgt_s), jnp.asarray(wgt_s), eta,
            jnp.asarray(ii_s), jnp.asarray(jj_s), jnp.asarray(free),
            jnp.asarray(be_s), jnp.asarray(bm_s),
            jnp.asarray(k0_s), jnp.asarray(rlen_s),
            iterations=iterations, lm=lm, ep=ep, alpha=cfg.rgbd_alpha,
            min_depth=cfg.min_depth, exchange=resolve_exchange(),
        )

    # --------------------------------------------------------------- export

    def upsample(self, ix, mask):
        """8x upsample disparities at slots ix (reference depth_video.py:134-138)."""
        if self.disps_up is None:
            self.disps_up = jnp.zeros((self.cfg.buffer, self.ht, self.wd), jnp.float32)
        d = self.disps[ix][..., None]
        up = cvx_upsample(d, mask)[..., 0]
        self.disps_up = self.disps_up.at[ix].set(up)

    def state_dict(self):
        """Snapshot for checkpointing (reference droid.py:92-106 npy bundle)."""
        t = self.counter
        return {
            "tstamps": self.tstamp[:t].copy(),
            "images": self.images[:t].copy(),
            "poses": np.asarray(self.poses[:t]),
            "disps": np.asarray(self.disps[:t]),
            "disps_sens": np.asarray(self.disps_sens[:t]),
            "intrinsics": np.asarray(self.intrinsics[:t]),
            "fmaps": np.asarray(self.fmaps[:t].astype(jnp.float32)),
            "nets": np.asarray(self.nets[:t].astype(jnp.float32)),
            "inps": np.asarray(self.inps[:t].astype(jnp.float32)),
        }

    def load_state_dict(self, state, offset=0):
        """Inject a saved session (reference loop_detect.py:226-240 Give_Data)."""
        t = len(state["tstamps"])
        self.tstamp[offset : offset + t] = state["tstamps"]
        self.images[offset : offset + t] = state["images"]
        self.poses = _set_range(self.poses, offset, jnp.asarray(state["poses"]))
        self.disps = _set_range(self.disps, offset, jnp.asarray(state["disps"]))
        if "disps_sens" in state:
            self.disps_sens = _set_range(self.disps_sens, offset, jnp.asarray(state["disps_sens"]))
        self.intrinsics = _set_range(self.intrinsics, offset, jnp.asarray(state["intrinsics"]))
        self.fmaps = _set_range(self.fmaps, offset, jnp.asarray(state["fmaps"], self.fmaps.dtype))
        self.nets = _set_range(self.nets, offset, jnp.asarray(state["nets"], self.nets.dtype))
        self.inps = _set_range(self.inps, offset, jnp.asarray(state["inps"], self.inps.dtype))
        self.counter = max(self.counter, offset + t)
