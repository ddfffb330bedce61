"""Damped, failure-tolerant Cholesky solvers (reference geom/chol.py).

The reference tolerates Cholesky failures by returning zeros and skipping
backward (geom/chol.py:8-24, droid_kernels.cu:1202-1210); here a NaN-check
replaces the exception path (jnp.linalg.cholesky yields NaNs instead of
raising), and the custom VJP mirrors CholeskySolver.backward:
dH = -x dz^T, db = dz.
"""
import jax
import jax.numpy as jnp


def _chol_solve(H, b):
    U = jnp.linalg.cholesky(H)
    xs = jax.scipy.linalg.cho_solve((U, True), b)
    return U, xs


@jax.custom_vjp
def cholesky_solve_safe(H, b):
    """Solve H x = b; returns zeros if the factorization fails (non-PD or
    overflowed system — NaN *or* inf)."""
    _, xs = _chol_solve(H, b)
    bad = jnp.any(~jnp.isfinite(xs), axis=(-2, -1), keepdims=True)
    return jnp.where(bad, jnp.zeros_like(xs), xs)


def _fwd(H, b):
    U, xs = _chol_solve(H, b)
    bad = jnp.any(~jnp.isfinite(xs), axis=(-2, -1), keepdims=True)
    xs = jnp.where(bad, jnp.zeros_like(xs), xs)
    return xs, (U, xs, bad)


def _bwd(res, grad_x):
    U, xs, bad = res
    dz = jax.scipy.linalg.cho_solve((U, True), grad_x)
    dz = jnp.where(bad | ~jnp.isfinite(dz), jnp.zeros_like(dz), dz)
    dH = -jnp.matmul(xs, jnp.swapaxes(dz, -1, -2))
    return dH, dz


cholesky_solve_safe.defvjp(_fwd, _bwd)


def block_solve(H, b, ep=0.1, lm=1e-4):
    """Solve block normal equations (reference chol.py:32-43).

    H: [B, N, N, D, D], b: [B, N, D] -> x [B, N, D].
    """
    B, N, _, D, _ = H.shape
    H = H.transpose(0, 1, 3, 2, 4).reshape(B, N * D, N * D)
    I = jnp.eye(N * D, dtype=H.dtype)
    H = H + (ep + lm * H) * I
    b = b.reshape(B, N * D, 1)
    x = cholesky_solve_safe(H, b)
    return x.reshape(B, N, D)


def schur_solve(H, E, C, v, w, ep=0.1, lm=1e-4, sless=False):
    """Solve via Schur complement over depth variables (reference chol.py:46-73).

    H: [B,P,P,D,D], E: [B,P,M,D,HW], C: [B,M,HW] (damped depth diagonal),
    v: [B,P,D], w: [B,M,HW].
    """
    B, P, M, D, HW = E.shape
    H = H.transpose(0, 1, 3, 2, 4).reshape(B, P * D, P * D)
    E = E.transpose(0, 1, 3, 2, 4).reshape(B, P * D, M * HW)
    Q = (1.0 / C).reshape(B, M * HW, 1)

    I = jnp.eye(P * D, dtype=H.dtype)
    H = H + (ep + lm * H) * I

    v = v.reshape(B, P * D, 1)
    w = w.reshape(B, M * HW, 1)

    Et = jnp.swapaxes(E, 1, 2)
    S = H - jnp.matmul(E, Q * Et)
    rhs = v - jnp.matmul(E, Q * w)

    dx = cholesky_solve_safe(S, rhs)
    if sless:
        return dx.reshape(B, P, D)

    dz = Q * (w - jnp.matmul(Et, dx))
    # failure tolerance for the depth half, mirroring the reference's CUDA
    # solver which zeroes BOTH dx and dz when the factorization fails
    # (droid_kernels.cu:1202-1210): a degenerate/overflowed system must
    # skip the whole update, not freeze poses while poisoning depths
    bad = jnp.any(~jnp.isfinite(dz), axis=(-2, -1), keepdims=True)
    dz = jnp.where(bad, jnp.zeros_like(dz), dz)
    return dx.reshape(B, P, D), dz.reshape(B, M, HW)
