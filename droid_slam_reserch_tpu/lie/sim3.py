"""Sim3 as [t(3), q(4 xyzw), s(1)] 8-vectors — pure JAX.

Mirrors the lietorch Sim3 API used by the reference for Sim3-mode training
losses and Jacobians (reference geom/losses.py:44-62, geom/projective_ops.py:
84-90).  Manifold dim 7, tangent order [tau, phi, sigma].
"""
import jax.numpy as jnp

from .so3 import quat_mul, quat_inv, quat_act, so3_exp, so3_log, quat_to_matrix
from .se3 import _hat


def sim3_identity(shape=(), dtype=jnp.float32):
    base = jnp.array([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (8,))


def _t(X):
    return X[..., :3]


def _q(X):
    return X[..., 3:7]


def _s(X):
    return X[..., 7:8]


def sim3_mul(X, Y):
    t = _t(X) + _s(X) * quat_act(_q(X), _t(Y))
    q = quat_mul(_q(X), _q(Y))
    s = _s(X) * _s(Y)
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_inv(X):
    qi = quat_inv(_q(X))
    si = 1.0 / _s(X)
    ti = -si * quat_act(qi, _t(X))
    return jnp.concatenate([ti, qi, si], axis=-1)


def sim3_act(X, P):
    """Act on homogeneous points [p, h]: Y = [s R p + h t, h]."""
    p, h = P[..., :3], P[..., 3:4]
    y = _s(X) * quat_act(_q(X), p) + h * _t(X)
    return jnp.concatenate([y, h], axis=-1)


def _W_coeffs(sigma, theta_sq):
    """Coefficients (C, B, A) of W = C I + B hat + A hat^2 for Sim3 exp."""
    s = jnp.exp(sigma)
    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta_sq < 1e-8

    sig_safe = jnp.where(sig_small, jnp.ones_like(sigma), sigma)
    th_safe = jnp.sqrt(jnp.where(th_small, jnp.ones_like(theta_sq), theta_sq))
    denom = sig_safe * sig_safe + th_safe * th_safe

    # C = int_0^1 e^{sigma u} du
    C = jnp.where(sig_small, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / sig_safe)

    # B = (1/theta) int e^{sigma u} sin(u theta) du
    B_full = (s * (sig_safe * jnp.sin(th_safe) - th_safe * jnp.cos(th_safe)) + th_safe) / (
        th_safe * denom
    )
    B_th_small = jnp.where(
        sig_small,
        0.5 + sigma / 3.0,
        (s * (sig_safe - 1.0) + 1.0) / (sig_safe * sig_safe),
    )
    B_sig_small = (1.0 - jnp.cos(th_safe)) / (th_safe * th_safe) + sigma * (
        (jnp.sin(th_safe) - th_safe * jnp.cos(th_safe)) / (th_safe ** 3)
    )
    B = jnp.where(th_small, B_th_small, jnp.where(sig_small, B_sig_small, B_full))

    # A = (1/theta^2) (C - int e^{sigma u} cos(u theta) du)
    int_cos = (s * (sig_safe * jnp.cos(th_safe) + th_safe * jnp.sin(th_safe)) - sig_safe) / denom
    A_full = (C - int_cos) / (th_safe * th_safe)
    A_th_small = jnp.where(
        sig_small,
        1.0 / 6.0 + sigma / 8.0,
        0.5 * (s * (sig_safe * sig_safe - 2.0 * sig_safe + 2.0) - 2.0) / (sig_safe ** 3),
    )
    A_sig_small = (th_safe - jnp.sin(th_safe)) / (th_safe ** 3) + sigma * (
        (2.0 - 2.0 * jnp.cos(th_safe) - th_safe * jnp.sin(th_safe)) / (th_safe ** 4)
    )
    A = jnp.where(th_small, A_th_small, jnp.where(sig_small, A_sig_small, A_full))
    return C, B, A


def _W_matrix(phi, sigma):
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    C, B, A = _W_coeffs(sigma, theta_sq)
    hat = _hat(phi)
    hat2 = hat @ hat
    eye = jnp.eye(3, dtype=phi.dtype)
    return C[..., None] * eye + B[..., None] * hat + A[..., None] * hat2


def sim3_exp(xi):
    """Tangent [tau, phi, sigma] (...,7) -> Sim3 8-vector."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _W_matrix(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, tau)
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_log(X):
    """Sim3 8-vector -> tangent [tau, phi, sigma] (...,7)."""
    phi = so3_log(_q(X))
    sigma = jnp.log(_s(X))
    W = _W_matrix(phi, sigma)
    tau = jnp.linalg.solve(W, _t(X)[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_retr(X, xi):
    return sim3_mul(sim3_exp(xi), X)


def sim3_adjT(X, a):
    """Dual adjoint applied to a (...,7) row vector [a_tau, a_phi, a_sigma].

    Convention matches SE3 se3_adjT (reference adjSE3, droid_kernels.cu:79-94)
    extended with the scale row:
      out_tau   = s R^{-1} a_tau
      out_phi   = R^{-1} (a_phi - t x a_tau)
      out_sigma = a_sigma - t . a_tau
    Verified against jax.jacfwd in tests/test_lie.py.
    """
    qi = quat_inv(_q(X))
    t = _t(X)
    a_tau, a_phi, a_sig = a[..., :3], a[..., 3:6], a[..., 6:7]
    out_tau = _s(X) * quat_act(qi, a_tau)
    out_phi = quat_act(qi, a_phi - jnp.cross(t, a_tau))
    out_sig = a_sig - jnp.sum(t * a_tau, axis=-1, keepdims=True)
    return jnp.concatenate([out_tau, out_phi, out_sig], axis=-1)


def sim3_matrix(X):
    """Sim3 8-vector -> homogeneous 4x4 matrix (sR | t)."""
    R = _s(X)[..., None] * quat_to_matrix(_q(X))
    t = _t(X)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=X.dtype), X.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
