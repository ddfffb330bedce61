"""SE3 as [t(3), q(4 xyzw)] 7-vectors — pure JAX.

Semantics mirror reference src/droid_kernels.cu:70-175,877-895 (actSE3,
adjSE3, relSE3, expSE3, retrSE3) and the lietorch SE3 API surface used by the
reference (SURVEY.md §2.1 "lietorch" row).  Manifold dim 6, tangent order
[tau, phi].
"""
import jax.numpy as jnp

from .so3 import quat_mul, quat_inv, quat_act, so3_exp, so3_log, quat_to_matrix, matrix_to_quat


def se3_identity(shape=(), dtype=jnp.float32):
    """Identity 7-vector(s): [0,0,0, 0,0,0,1]."""
    base = jnp.array([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (7,))


def se3_t(X):
    return X[..., :3]


def se3_q(X):
    return X[..., 3:7]


def se3_mul(X, Y):
    """Group product X*Y."""
    t = se3_t(X) + quat_act(se3_q(X), se3_t(Y))
    q = quat_mul(se3_q(X), se3_q(Y))
    return jnp.concatenate([t, q], axis=-1)


def se3_inv(X):
    qi = quat_inv(se3_q(X))
    ti = -quat_act(qi, se3_t(X))
    return jnp.concatenate([ti, qi], axis=-1)


def se3_act(X, P):
    """Act on homogeneous points P=[x,y,z,h]: Y = [R p + h t, h].

    Matches actSE3 (reference droid_kernels.cu:70-77): the homogeneous/
    disparity coordinate scales the translation.
    """
    p, h = P[..., :3], P[..., 3:4]
    y = quat_act(se3_q(X), p) + h * se3_t(X)
    return jnp.concatenate([y, h], axis=-1)


def se3_act3(X, p):
    """Act on 3D points: R p + t."""
    return quat_act(se3_q(X), p) + se3_t(X)


def _hat(phi):
    """Skew matrix of (...,3)."""
    x, y, z = jnp.moveaxis(phi, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def _V_coeffs(theta_sq):
    """a=(1-cos)/th^2, b=(th-sin)/th^3 with Taylor fallbacks (cutoff as
    reference expSE3, droid_kernels.cu:162)."""
    small = theta_sq < 1e-8
    # sqrt argument guarded so gradients stay finite at theta = 0
    th_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    a_f = (1.0 - jnp.cos(th_safe)) / (th_safe * th_safe)
    b_f = (th_safe - jnp.sin(th_safe)) / (th_safe ** 3)
    a_t = 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0
    b_t = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    return jnp.where(small, a_t, a_f), jnp.where(small, b_t, b_f)


def se3_exp(xi):
    """Tangent [tau, phi] (...,6) -> SE3 7-vector."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    a, b = _V_coeffs(theta_sq)
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = tau + a * c1 + b * c2
    return jnp.concatenate([t, q], axis=-1)


def se3_log(X):
    """SE3 7-vector -> tangent [tau, phi] (...,6)."""
    phi = so3_log(se3_q(X))
    t = se3_t(X)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    th_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    # Vinv = I - 1/2 hat + c hat^2 ; c = 1/th^2 - (1+cos)/(2 th sin)
    half = th_safe / 2.0
    c_f = (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-12)) / jnp.maximum(
        theta_sq, 1e-12
    )
    c_t = 1.0 / 12.0 + theta_sq / 720.0
    c = jnp.where(small, c_t, c_f)
    c1 = jnp.cross(phi, t)
    c2 = jnp.cross(phi, c1)
    tau = t - 0.5 * c1 + c * c2
    return jnp.concatenate([tau, phi], axis=-1)


def se3_retr(X, xi):
    """Left retraction exp(xi) * X (reference retrSE3, droid_kernels.cu:877-895)."""
    return se3_mul(se3_exp(xi), X)


def se3_adjT(X, a):
    """Dual adjoint Adj_X^T applied to a (...,6) tangent-space row vector.

    Matches adjSE3 (reference droid_kernels.cu:79-94, where u = X x t):
      out[:3] = R^{-1} a[:3]
      out[3:] = R^{-1} a[3:] - R^{-1} (t x a[:3])
    """
    qi = quat_inv(se3_q(X))
    t = se3_t(X)
    u = jnp.cross(a[..., :3], t)
    lin = quat_act(qi, a[..., :3])
    ang = quat_act(qi, a[..., 3:6]) + quat_act(qi, u)
    return jnp.concatenate([lin, ang], axis=-1)


def se3_adj(X, a):
    """Adjoint Adj_X applied to a (...,6) tangent vector [tau, phi]."""
    q, t = se3_q(X), se3_t(X)
    phi2 = quat_act(q, a[..., 3:6])
    tau2 = quat_act(q, a[..., :3]) + jnp.cross(t, phi2)
    return jnp.concatenate([tau2, phi2], axis=-1)


def se3_matrix(X):
    """SE3 7-vector -> homogeneous 4x4 matrix."""
    R = quat_to_matrix(se3_q(X))
    t = se3_t(X)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=X.dtype), X.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    """4x4 homogeneous matrix -> SE3 7-vector."""
    q = matrix_to_quat(T[..., :3, :3])
    t = T[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)
