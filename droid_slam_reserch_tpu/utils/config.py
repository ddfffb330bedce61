"""One typed, central configuration.

The reference duplicates ~25 argparse flags per entry script and scatters
magic constants inline (SURVEY.md §5 "Config / flag system"); here every
tunable lives in one dataclass, with the per-dataset presets the reference
hardcodes in its eval scripts (test_euroc.py:89-100, validate_tartanair.py:
53-62, test_eth3d.py:66-80).
"""
import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class DroidConfig:
    # model
    weights: Optional[str] = None          # path to droid.pth-style checkpoint
    vis_path: str = ""                     # live viewer PLY sink ("" = off)
    image_size: Tuple[int, int] = (240, 320)
    buffer: int = 512                      # keyframe ring buffer capacity
    stereo: bool = False
    rgbd: bool = False
    upsample: bool = False

    # motion filter (reference demo.py:114, motion_filter.py:15)
    filter_thresh: float = 2.4
    warmup: int = 8

    # frontend (reference demo.py:113-120, droid_frontend.py:23-35)
    beta: float = 0.3
    keyframe_thresh: float = 4.0
    frontend_thresh: float = 16.0
    frontend_window: int = 25
    frontend_radius: int = 2
    frontend_nms: int = 1
    max_factors: int = 48                  # droid_frontend.py:13
    max_age: int = 25                      # droid_frontend.py:23
    iters1: int = 4                        # droid_frontend.py:24
    iters2: int = 2                        # droid_frontend.py:25
    init_iters: int = 8                    # droid_frontend.py:87,92

    # backend (reference demo.py:122-124, droid.py:121-125)
    backend_thresh: float = 22.0
    backend_radius: int = 2
    backend_nms: int = 3
    backend_steps_first: int = 7
    backend_steps_second: int = 12

    # BA numerics (reference factor_graph.py:240-241,297-298, ba.py:43)
    ba_iters: int = 2
    frontend_lm: float = 1e-4
    frontend_ep: float = 0.1
    backend_lm: float = 1e-5
    backend_ep: float = 1e-2
    damping_eps: float = 1e-7              # EP in factor_graph.update
    min_depth: float = 0.25                # droid_kernels.cu:26 (inference BA)
    rgbd_alpha: float = 0.05               # droid_kernels.cu:1396

    # multisession quality gating (reference s_droid_frontend.py:114-177)
    good: bool = True
    quality_mean_thresh: float = 200.0
    quality_min_thresh: float = 10.0

    # TPU execution
    # fused Pallas BA system builder (ops/pallas_ba.py): on the v5e chip it
    # is both ~2.7x faster than the XLA block builder inside the 2-GN solve
    # (1.7 vs 4.5 ms at EuRoC scale) and ~1000x closer to the CPU fp32
    # oracle (2e-6 vs 3e-3 rel err — the XLA einsums pay bf16 MXU passes).
    # Auto-gated off on CPU (resolve_pallas_ba), where Pallas only
    # interprets.
    use_pallas_ba: bool = True
    # global-BA motion features via fused altcorr over pooled feature
    # pyramids instead of materialized O(E*(HW)^2) volumes — the backend
    # memory fix the reference ships as AltCorrBlock (factor_graph.py:261)
    use_altcorr_backend: bool = True
    # shard full-window dense BA over this many mesh devices (keyframe/depth
    # buckets sharded, pose system exchanged block-sparse —
    # parallel/dist_ba.py).  -1 (default) = auto: windows >= 128 keyframes
    # use every local device; 0/1 = always single-device.
    ba_shards: int = -1
    # shard the backend's chunked GRU+altcorr edge refresh (update_lowmem)
    # over this many local devices (engine/factor_graph.py
    # _lowmem_refresh_sharded).  -1 = auto (every local device), 0/1 = off.
    refresh_shards: int = -1
    edge_bucket: int = 16                  # pad edge counts to multiples
    window_bucket: int = 8                 # pad BA window sizes to multiples
    compute_dtype: str = "float32"         # "bfloat16" on TPU for the network

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# per-dataset presets (reference evaluation_scripts/*)
EUROC_CONFIG = DroidConfig(
    image_size=(320, 512), warmup=15, keyframe_thresh=3.5,
    frontend_thresh=17.5, frontend_window=20, backend_thresh=24.0,
    backend_nms=2,
)
TUM_CONFIG = DroidConfig(
    image_size=(240, 320), buffer=512, frontend_window=16, frontend_thresh=16.0,
)
TARTANAIR_CONFIG = DroidConfig(
    image_size=(384, 512), buffer=1000, warmup=12, frontend_thresh=15.0,
    frontend_window=20, frontend_radius=1, frontend_nms=1, beta=0.5,
    backend_thresh=20.0, backend_nms=2,
)
ETH3D_CONFIG = DroidConfig(
    image_size=(480, 640), buffer=1024, warmup=20, rgbd=True,
)


def resolve_pallas_ba(cfg):
    """cfg.use_pallas_ba gated to TPU — the kernels use pltpu block specs,
    which only interpret on CPU and fail to lower on GPU, so the XLA block
    builder is the path on every non-TPU backend."""
    import jax

    return bool(cfg.use_pallas_ba) and jax.devices()[0].platform == "tpu"
