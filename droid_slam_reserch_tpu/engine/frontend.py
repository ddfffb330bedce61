"""Local tracking frontend (reference droid_frontend.py:9-121)."""
import numpy as np

from .factor_graph import FactorGraph


class Frontend:
    def __init__(self, applies, params, video, config, dtype=None):
        import jax.numpy as jnp

        self.video = video
        self.cfg = config
        self.graph = FactorGraph(
            video, applies["update"], params,
            max_factors=config.max_factors, upsample=config.upsample,
            dtype=dtype or jnp.float32,
        )

        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0

        self.max_age = config.max_age
        self.iters1 = config.iters1
        self.iters2 = config.iters2
        self.warmup = config.warmup
        self.beta = config.beta
        self.frontend_nms = config.frontend_nms
        self.keyframe_thresh = config.keyframe_thresh
        self.frontend_window = config.frontend_window
        self.frontend_thresh = config.frontend_thresh
        self.frontend_radius = config.frontend_radius

    def _run_updates(self, rounds, t0=None, cull_pair=None):
        """rounds x (update op + DBA) as one fused device program; the final
        round's upmask drives upsampling when cfg.upsample is set.  Returns
        the in-graph culling distance when cull_pair is given."""
        return self.graph.update_fused(
            rounds, t0=t0, use_inactive=True, cull_pair=cull_pair
        )

    def _proximity_key(self, t1):
        return (t1 - 5, max(t1 - self.frontend_window, 0), t1)

    def _prefetch_proximity(self):
        """Dispatch the NEXT keyframe's proximity distance matrix now and
        start its host transfer: its inputs (poses/disps, including the
        extrapolated next slot) cannot change before that keyframe arrives,
        so the per-keyframe edge-selection sync becomes an overlapped copy
        (SURVEY.md "Hard parts" #4)."""
        t0q, t1q, t_next = self._proximity_key(self.t1 + 1)
        if t0q < 0:
            self._prox_prefetch = None
            return
        dm = self.video.distance_matrix_async(t0q, t1q, t_next, beta=self.beta)
        try:
            dm.copy_to_host_async()
        except Exception:
            pass
        self._prox_prefetch = ((t0q, t1q, t_next), dm)

    def _take_prefetched_proximity(self):
        pre = getattr(self, "_prox_prefetch", None)
        self._prox_prefetch = None
        if pre is not None and pre[0] == self._proximity_key(self.t1):
            return np.asarray(pre[1])
        return None

    def __update(self):
        """Add edges, perform update (reference :37-75)."""
        import jax.numpy as jnp

        self.count += 1
        self.t1 += 1

        if len(self.graph.ii) > 0:
            self.graph.rm_factors(self.graph.age > self.max_age, store=True)

        self.graph.add_proximity_factors(
            self.t1 - 5, max(self.t1 - self.frontend_window, 0),
            rad=self.frontend_radius, nms=self.frontend_nms,
            thresh=self.frontend_thresh, beta=self.beta, remove=True,
            dmat=self._take_prefetched_proximity(),
        )

        # RGB-D: seed new keyframe's disparity from the sensor (reference :49-50)
        v = self.video
        dsens = v.disps_sens[self.t1 - 1]
        v.disps = v.disps.at[self.t1 - 1].set(
            jnp.where(dsens > 0, dsens, v.disps[self.t1 - 1])
        )

        # keyframe culling by flow distance (reference :56-64); the distance
        # rides the fused program — its float() is the ONE host sync per kf
        d_cull = self._run_updates(
            self.iters1, cull_pair=(self.t1 - 3, self.t1 - 2)
        )
        if d_cull is None:  # empty graph: no fused program ran
            d_cull = self.video.distance(
                [self.t1 - 3], [self.t1 - 2], beta=self.beta,
                bidirectional=True,
            )[0]
        else:
            # start the scalar's device->host copy immediately so the
            # float() below finds it already landed (the dispatch of the
            # rounds program overlaps the copy; measured on the async
            # proximity prefetch: 0.2 ms vs a 29.8 ms blocking transfer)
            try:
                d_cull.copy_to_host_async()
            except Exception:
                pass
        from ..utils.timing import count_sync

        count_sync()  # culling decision rides the fused program's output
        if float(d_cull) < self.keyframe_thresh:
            self.graph.rm_keyframe(self.t1 - 2)
            self.video.counter -= 1
            self.t1 -= 1
        else:
            self._run_updates(self.iters2)

        # initialize next frame's pose/disp by copy (reference :71-72)
        v.poses = v.poses.at[self.t1].set(v.poses[self.t1 - 1])
        v.disps = v.disps.at[self.t1].set(jnp.mean(v.disps[self.t1 - 1]))

        self.video.dirty[int(self.graph.ii.min()) : self.t1] = True
        self._prefetch_proximity()

    def __initialize(self):
        """Bootstrap the map (reference :77-110)."""
        import jax.numpy as jnp

        v = self.video
        self.t0 = 0
        self.t1 = v.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        self._run_updates(self.cfg.init_iters, t0=1)

        self.graph.add_proximity_factors(
            0, 0, rad=2, nms=2, thresh=self.frontend_thresh, remove=False
        )
        self._run_updates(self.cfg.init_iters, t0=1)

        v.poses = v.poses.at[self.t1].set(v.poses[self.t1 - 1])
        v.disps = v.disps.at[self.t1].set(jnp.mean(v.disps[self.t1 - 4 : self.t1]))

        self.is_initialized = True
        self.video.dirty[: self.t1] = True
        self.graph.rm_factors(self.graph.ii < self.warmup - 4, store=True)
        self._prefetch_proximity()

    def __call__(self):
        from ..utils.timing import section

        with section("frontend"):
            return self._step()

    def _step(self):
        """Main update (reference :112-121)."""
        if not self.is_initialized and self.video.counter == self.warmup:
            self.__initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._do_update()

    def _do_update(self):
        self.__update()


class SessionFrontend(Frontend):
    """Multisession frontend with confidence-gated keyframe acceptance
    (reference s_droid_frontend.py:9-225).

    With ``good=False`` each post-init keyframe is verified: the update op
    runs once and the summed confidence weights of edges touching the newest
    frame (other endpoint within the last 3 frames) must average > 200 with
    every edge > 10 — otherwise the keyframe is rejected and its timestamp
    recorded in ``badT`` (the fork's loop-closure verification signal).
    """

    def __init__(self, applies, params, video, config, dtype=None):
        super().__init__(applies, params, video, config, dtype=dtype)
        self.good = config.good
        self.badT = []

    def _do_update(self):
        import jax.numpy as jnp

        if self.good:
            super()._do_update()
            return

        self.count += 1
        self.t1 += 1
        v = self.video

        if len(self.graph.ii) > 0:
            self.graph.rm_factors(self.graph.age > self.max_age, store=True)

        self.graph.add_proximity_factors(
            self.t1 - 5, max(self.t1 - self.frontend_window, 0),
            rad=self.frontend_radius, nms=self.frontend_nms,
            thresh=self.frontend_thresh, beta=self.beta, remove=True,
        )
        dsens = v.disps_sens[self.t1 - 1]
        v.disps = v.disps.at[self.t1 - 1].set(
            jnp.where(dsens > 0, dsens, v.disps[self.t1 - 1])
        )

        # quality gate (reference s_droid_frontend.py:116-164)
        summed = self.graph.probe_quality()
        newest = v.counter - 1
        sel = []
        for k in range(len(self.graph.ii)):
            i, j = int(self.graph.ii[k]), int(self.graph.jj[k])
            if i == newest and j > newest - 3 and j != i:
                sel.append(k)
            elif j == newest and i > newest - 3 and i != j:
                sel.append(k)
        vals = summed[sorted(sel)] if sel else np.zeros(0)

        ok = len(vals) > 0 and vals.mean() > self.cfg.quality_mean_thresh and np.all(
            vals > self.cfg.quality_min_thresh
        )
        if ok:
            self._run_updates(self.iters1 + self.iters2)
            v.poses = v.poses.at[self.t1].set(v.poses[self.t1 - 1])
            v.disps = v.disps.at[self.t1].set(jnp.mean(v.disps[self.t1 - 1]))
            self.video.dirty[int(self.graph.ii.min()) : self.t1] = True
        else:
            self.graph.rm_keyframe(self.t1 - 2)
            self.badT.append(float(v.tstamp[v.counter - 1]))
            v.counter -= 1
            self.t1 -= 1
