"""Training: unrolled DBA training step, losses, logging, checkpoints.

Mirror of reference train.py:43-186 + logger.py, redesigned for pjit data
parallelism over a device mesh instead of DDP/NCCL (SURVEY.md §2.7).
"""
from .config import TrainConfig
from .step import make_train_step, init_train_state
from .logger import Logger
from .checkpoint import save_ckpt, load_ckpt

__all__ = [k for k in dir() if not k.startswith("_")]
