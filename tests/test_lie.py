"""Group-axiom / exp-log / adjoint tests for the lie module.

Mirrors the verification the reference never had (SURVEY.md §4): numerical
parity with the quaternion formulas in reference src/droid_kernels.cu:58-175.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_reserch_tpu import lie

jax.config.update("jax_enable_x64", False)


def rand_se3(key, shape=()):
    k1, k2 = jax.random.split(key)
    xi = 0.5 * jax.random.normal(k1, shape + (6,))
    return lie.se3_exp(xi)


def rand_sim3(key, shape=()):
    xi = 0.4 * jax.random.normal(key, shape + (7,))
    return lie.sim3_exp(xi)


class TestSO3:
    def test_exp_log_roundtrip(self):
        # stay within the injectivity radius |phi| < pi
        phi = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (64, 3))
        q = lie.so3_exp(phi)
        np.testing.assert_allclose(lie.so3_log(q), phi, atol=1e-5)

    def test_exp_small_angle(self):
        phi = 1e-6 * jax.random.normal(jax.random.PRNGKey(1), (8, 3))
        q = lie.so3_exp(phi)
        np.testing.assert_allclose(lie.so3_log(q), phi, atol=1e-9)
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-6)

    def test_quat_act_matches_matrix(self):
        key = jax.random.PRNGKey(2)
        q = lie.so3_exp(jax.random.normal(key, (16, 3)))
        x = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
        R = lie.quat_to_matrix(q)
        np.testing.assert_allclose(
            lie.quat_act(q, x), jnp.einsum("nij,nj->ni", R, x), atol=1e-5
        )

    def test_matrix_roundtrip(self):
        q = lie.so3_exp(jax.random.normal(jax.random.PRNGKey(4), (32, 3)))
        q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
        # quaternions are a double cover: compare up to sign
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)


class TestSE3:
    def test_identity(self):
        X = rand_se3(jax.random.PRNGKey(0), (8,))
        I = lie.se3_identity((8,))
        np.testing.assert_allclose(lie.se3_mul(I, X), X, atol=1e-6)
        np.testing.assert_allclose(lie.se3_mul(X, I), X, atol=1e-6)

    def test_inverse(self):
        X = rand_se3(jax.random.PRNGKey(1), (8,))
        XiX = lie.se3_mul(lie.se3_inv(X), X)
        np.testing.assert_allclose(XiX, lie.se3_identity((8,)), atol=1e-5)

    def test_associativity(self):
        k = jax.random.PRNGKey(2)
        A, B, C = (rand_se3(jax.random.fold_in(k, i), (4,)) for i in range(3))
        lhs = lie.se3_mul(lie.se3_mul(A, B), C)
        rhs = lie.se3_mul(A, lie.se3_mul(B, C))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (64, 6))
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-4)

    def test_exp_log_small(self):
        xi = 1e-7 * jax.random.normal(jax.random.PRNGKey(4), (8, 6))
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-10)

    def test_act_homogeneous(self):
        """act on [p, h] must equal h-scaled rigid transform (actSE3 semantics)."""
        X = rand_se3(jax.random.PRNGKey(5), (8,))
        P = jax.random.normal(jax.random.PRNGKey(6), (8, 4))
        Y = lie.se3_act(X, P)
        T = lie.se3_matrix(X)
        p, h = P[..., :3], P[..., 3:4]
        expect = jnp.einsum("nij,nj->ni", T[..., :3, :3], p) + h * T[..., :3, 3]
        np.testing.assert_allclose(Y[..., :3], expect, atol=1e-5)
        np.testing.assert_allclose(Y[..., 3], P[..., 3], atol=1e-6)

    def test_retr_matches_exp_mul(self):
        X = rand_se3(jax.random.PRNGKey(7), (4,))
        xi = 0.1 * jax.random.normal(jax.random.PRNGKey(8), (4, 6))
        np.testing.assert_allclose(
            lie.se3_retr(X, xi), lie.se3_mul(lie.se3_exp(xi), X), atol=1e-6
        )

    def test_adjoint_identity(self):
        """G * exp(xi) == exp(Adj_G xi) * G."""
        G = rand_se3(jax.random.PRNGKey(9), (4,))
        xi = 0.3 * jax.random.normal(jax.random.PRNGKey(10), (4, 6))
        lhs = lie.se3_mul(G, lie.se3_exp(xi))
        rhs = lie.se3_mul(lie.se3_exp(lie.se3_adj(G, xi)), G)
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_adjT_is_transpose_of_adj(self):
        G = rand_se3(jax.random.PRNGKey(11), (16,))
        x = jax.random.normal(jax.random.PRNGKey(12), (16, 6))
        y = jax.random.normal(jax.random.PRNGKey(13), (16, 6))
        lhs = jnp.sum(lie.se3_adj(G, x) * y, axis=-1)
        rhs = jnp.sum(x * lie.se3_adjT(G, y), axis=-1)
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_matrix_roundtrip(self):
        X = rand_se3(jax.random.PRNGKey(14), (16,))
        X2 = lie.se3_from_matrix(lie.se3_matrix(X))
        np.testing.assert_allclose(X2[..., :3], X[..., :3], atol=1e-5)
        dot = jnp.abs(jnp.sum(X2[..., 3:] * X[..., 3:], axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)


class TestSim3:
    def test_identity_inverse(self):
        X = rand_sim3(jax.random.PRNGKey(0), (8,))
        I = lie.sim3_identity((8,))
        np.testing.assert_allclose(lie.sim3_mul(X, lie.sim3_inv(X)), I, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (64, 7))
        np.testing.assert_allclose(lie.sim3_log(lie.sim3_exp(xi)), xi, atol=1e-4)

    def test_exp_log_small(self):
        xi = 1e-6 * jax.random.normal(jax.random.PRNGKey(2), (8, 7))
        # fp32 stores s = e^sigma near 1, losing ~eps of absolute precision
        np.testing.assert_allclose(lie.sim3_log(lie.sim3_exp(xi)), xi, atol=3e-7)

    def test_exp_zero_rotation(self):
        xi = jnp.zeros((4, 7)).at[:, :3].set(jax.random.normal(jax.random.PRNGKey(3), (4, 3)))
        X = lie.sim3_exp(xi)
        np.testing.assert_allclose(X[..., :3], xi[..., :3], atol=1e-5)

    def test_act_matches_matrix(self):
        X = rand_sim3(jax.random.PRNGKey(4), (8,))
        P = jax.random.normal(jax.random.PRNGKey(5), (8, 4))
        Y = lie.sim3_act(X, P)
        T = lie.sim3_matrix(X)
        expect = (
            jnp.einsum("nij,nj->ni", T[..., :3, :3], P[..., :3])
            + P[..., 3:4] * T[..., :3, 3]
        )
        np.testing.assert_allclose(Y[..., :3], expect, atol=1e-5)

    def test_adjoint_identity_via_adjT(self):
        """dot(xi, adjT(G, a)) == dot(Adj_G xi, a), with Adj from G exp(xi) = exp(Adj xi) G.

        Finite check: numerically compute Adj via log(G exp(xi) G^-1).
        """
        G = rand_sim3(jax.random.PRNGKey(6), ())
        for i in range(4):
            xi = 1e-4 * jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(7), i), (7,))
            adj_xi = lie.sim3_log(
                lie.sim3_mul(lie.sim3_mul(G, lie.sim3_exp(xi)), lie.sim3_inv(G))
            )
            a = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(8), i), (7,))
            lhs = jnp.sum(adj_xi * a)
            rhs = jnp.sum(xi * lie.sim3_adjT(G, a))
            np.testing.assert_allclose(lhs, rhs, rtol=1e-2, atol=1e-7)
