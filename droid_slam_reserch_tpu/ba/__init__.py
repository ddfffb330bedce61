"""Dense bundle adjustment (DBA) — TPU-native Gauss-Newton + Schur.

One BA math core with two entry points (collapsing the reference's three
implementations — CUDA ba_cuda, Python BA, MoBA — into one design,
SURVEY.md §7 design-delta 4):

- ``dense``   fully differentiable BA/MoBA for training (the reference
              geom/ba.py:31-158 analog), dense pose-depth coupling
- ``solver``  scalable inference driver (the reference ba_cuda analog,
              src/droid_kernels.cu:1314-1434): segment-summed Schur
              complement, no CPU round-trip, all static shapes
- ``system``  per-edge Hessian/rhs/coupling block builder (the
              projective_transform_kernel analog, droid_kernels.cu:176-424)
- ``chol``    damped, failure-tolerant Cholesky with custom VJP
              (reference geom/chol.py)
"""
from .chol import cholesky_solve_safe, block_solve, schur_solve
from .system import build_system_blocks
from .dense import BA, MoBA
from .solver import ba_solve, schur_pairs

__all__ = [k for k in dir() if not k.startswith("_")]
