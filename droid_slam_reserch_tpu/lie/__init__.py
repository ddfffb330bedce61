"""Quaternion-based Lie groups (SO3 / SE3 / Sim3) as pure JAX functions.

TPU-native replacement for the reference's ``lietorch`` C++/CUDA extension
(reference setup.py:34-61) and the device-side quaternion math in
reference src/droid_kernels.cu:58-175 (actSO3/actSE3/adjSE3/relSE3/expSO3/
expSE3/retrSE3).  Conventions match the reference exactly:

- quaternions are **xyzw**, Hamilton product
- SE3 data layout is ``[tx, ty, tz, qx, qy, qz, qw]`` (7-vector)
- Sim3 data layout is ``[tx, ty, tz, qx, qy, qz, qw, s]`` (8-vector)
- SE3 tangent order ``[tau(3), phi(3)]``; Sim3 ``[tau, phi, sigma]``
- retraction is *left* multiplication: ``retr(X, xi) = exp(xi) * X``
  (reference src/droid_kernels.cu:877-895)

Everything is a plain function over arrays with trailing data dims, so it
vmaps/jits/shards freely — there is no tensor subclass.
"""

from .so3 import (
    quat_mul,
    quat_inv,
    quat_act,
    quat_normalize,
    so3_exp,
    so3_log,
    quat_to_matrix,
    matrix_to_quat,
)
from .se3 import (
    se3_identity,
    se3_inv,
    se3_mul,
    se3_act,
    se3_act3,
    se3_exp,
    se3_log,
    se3_retr,
    se3_adjT,
    se3_adj,
    se3_matrix,
    se3_from_matrix,
)
from .sim3 import (
    sim3_identity,
    sim3_inv,
    sim3_mul,
    sim3_act,
    sim3_exp,
    sim3_log,
    sim3_retr,
    sim3_adjT,
    sim3_matrix,
)

__all__ = [k for k in dir() if not k.startswith("_")]
