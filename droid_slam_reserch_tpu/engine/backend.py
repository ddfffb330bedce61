"""Global BA backend (reference droid_backend.py:9-41)."""
import jax.numpy as jnp
import numpy as np

from .factor_graph import FactorGraph


class Backend:
    def __init__(self, applies, params, video, config, dtype=None):
        self.applies = applies
        self.params = params
        self.video = video
        self.cfg = config
        self.dtype = dtype or jnp.float32

    def __call__(self, steps=12):
        from ..utils.timing import section

        with section("backend"):
            return self._run(steps)

    def _run(self, steps=12):
        v = self.video
        t = v.counter
        if t < 2:
            return

        # mono without depth sensing: fix the scale gauge (reference :29-30)
        if not v.stereo and not bool(jnp.any(v.disps_sens[:t] > 0)):
            v.normalize()

        graph = FactorGraph(
            v, self.applies["update"], self.params,
            max_factors=16 * t, upsample=self.cfg.upsample, dtype=self.dtype,
        )
        graph.add_proximity_factors(
            rad=self.cfg.backend_radius, nms=self.cfg.backend_nms,
            thresh=self.cfg.backend_thresh, beta=self.cfg.beta,
        )
        graph.update_lowmem(steps=steps)
        graph.clear_edges()
        v.dirty[:t] = True
