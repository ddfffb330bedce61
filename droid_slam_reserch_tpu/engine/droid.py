"""Droid facade (reference droid.py:17-154) and the multisession SDroid
variant (reference s_droid.py:20-112)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import se3_inv
from ..models import DroidNet, load_torch_checkpoint
from ..utils import DroidConfig
from .backend import Backend
from .frontend import Frontend
from .motion_filter import MotionFilter, SessionMotionFilter
from .net_ops import make_applies
from .trajectory_filler import TrajectoryFiller
from .video import Video


def init_params(config, seed=0):
    """Load converted droid.pth weights, or random-init (tests).

    Random init goes submodule-by-submodule (fnet/cnet/update) so no BA/corr
    graph gets traced just to create parameters.
    """
    if config.weights:
        if not os.path.exists(config.weights):
            raise FileNotFoundError(
                f"weights checkpoint not found: {config.weights} "
                "(refusing to silently run with random weights)"
            )
        if config.weights.endswith((".pth", ".pt")):
            return load_torch_checkpoint(config.weights)["params"]
        data = np.load(config.weights, allow_pickle=True)
        return jax.tree_util.tree_map(jnp.asarray, data["params"].item())

    from ..models.extractor import BasicEncoder
    from ..models.update import UpdateModule

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    h, w = 64, 64
    img = jnp.zeros((1, h, w, 3))
    fnet = BasicEncoder(output_dim=128, norm_fn="instance").init(k1, img)["params"]
    cnet = BasicEncoder(output_dim=256, norm_fn="none").init(k2, img)["params"]
    h8, w8 = h // 8, w // 8
    update = UpdateModule().init(
        k3,
        jnp.zeros((1, 2, h8, w8, 128)),
        jnp.zeros((1, 2, h8, w8, 128)),
        jnp.zeros((1, 2, h8, w8, 196)),
        jnp.zeros((1, 2, h8, w8, 4)),
        jnp.array([0, 1]),
        2,
    )["params"]
    return {"fnet": fnet, "cnet": cnet, "update": update}


class Droid:
    """Facade: filter -> frontend -> backend -> trajectory filler."""

    filter_cls = MotionFilter

    def __init__(self, config: DroidConfig, params=None):
        self.cfg = config
        self.dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        self.params = params if params is not None else init_params(config)
        self.applies = make_applies(config.compute_dtype)

        self.video = Video(config)
        self.filterx = self.filter_cls(
            self.applies, self.params, self.video,
            thresh=config.filter_thresh, dtype=self.dtype,
        )
        self.frontend = Frontend(self.applies, self.params, self.video, config, dtype=self.dtype)
        self.backend = Backend(self.applies, self.params, self.video, config, dtype=self.dtype)
        self.traj_filler = TrajectoryFiller(self.applies, self.params, self.video, config, dtype=self.dtype)

        # live visualization consumer (reference droid.py:40-43 spawns a
        # viewer process polling video.dirty; here a host thread streams an
        # incrementally-updated PLY — viz/live.py)
        self.viewer = None
        if config.vis_path:
            from ..viz.live import LiveViewer

            self.viewer = LiveViewer(self.video, out_path=config.vis_path).start()

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """Per-frame tracking (reference droid.py:76-90)."""
        self.filterx.track(tstamp, image, depth, intrinsics)
        self.frontend()

    def terminate(self, stream=None):
        """Global refinement (reference droid.py:114-126)."""
        del self.frontend
        self.backend(self.cfg.backend_steps_first)
        self.backend(self.cfg.backend_steps_second)
        if self.viewer is not None:
            self.viewer.stop()
        from ..utils.timing import maybe_report

        maybe_report()

    def terminate_eva(self, stream=None):
        """Backend + trajectory fill; returns camera trajectory [T, 7]
        (world-to-camera inverted, reference droid.py:132-146)."""
        del self.frontend
        self.backend(self.cfg.backend_steps_first)
        self.backend(self.cfg.backend_steps_second)
        if self.viewer is not None:
            self.viewer.stop()
        poses = self.traj_filler(stream)
        return np.asarray(se3_inv(jnp.asarray(poses)))

    def terminate_eva_second(self, stream=None):
        """Trajectory fill only (reference droid.py:148-153)."""
        del self.frontend
        poses = self.traj_filler(stream)
        return np.asarray(se3_inv(jnp.asarray(poses)))

    def save_reconstruction(self, path):
        """Dump the session state (reference droid.py:92-106)."""
        os.makedirs(path, exist_ok=True)
        state = self.video.state_dict()
        np.savez_compressed(os.path.join(path, "reconstruction.npz"), **state)
        for k, v in state.items():
            np.save(os.path.join(path, f"{k}.npy"), v)

    def save_backend_finished_poses(self, path):
        """reference droid.py:108-111."""
        os.makedirs(path, exist_ok=True)
        t = self.video.counter
        np.save(
            os.path.join(path, "backend_finished_poses.npy"),
            np.asarray(self.video.poses[:t]),
        )


class SDroid(Droid):
    """Multisession variant (reference s_droid.py:20-112): session-aware
    motion filter (preloaded pose/disp survive) and a quality-gated frontend
    mode; terminate() runs the double backend without trajectory filling."""

    filter_cls = SessionMotionFilter

    def __init__(self, config, params=None):
        super().__init__(config, params)
        from .frontend import SessionFrontend

        self.frontend = SessionFrontend(
            self.applies, self.params, self.video, config, dtype=self.dtype
        )

    def terminate(self, stream=None):
        del self.frontend
        self.backend(self.cfg.backend_steps_first)
        self.backend(self.cfg.backend_steps_second)
        if self.viewer is not None:
            self.viewer.stop()
