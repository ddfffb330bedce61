"""Bundle adjustment tests.

The reference's only numerical seam is the cuda_ba/py_ba duality
(reference factor_graph.py:236-245, SURVEY.md §4.3); here that becomes the
dense-vs-solver parity test, plus synthetic convergence tests the reference
never had.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_reserch_tpu import lie
from droid_slam_reserch_tpu.ba import BA, MoBA, ba_solve, schur_pairs
from droid_slam_reserch_tpu.geom import projective_transform, neighbourhood_graph


H, W = 6, 8
FX = 30.0


def make_scene(key, P=4):
    ks = jax.random.split(key, 4)
    # small forward motions with slight rotation
    xi = jnp.concatenate(
        [
            0.1 * jax.random.normal(ks[0], (P, 3)),
            0.03 * jax.random.normal(ks[1], (P, 3)),
        ],
        axis=-1,
    )
    poses = lie.se3_exp(xi)
    disps = 0.8 + 0.4 * jax.random.uniform(ks[2], (P, H, W))
    intr = jnp.array([FX, FX, W / 2.0, H / 2.0])
    return poses, disps, intr


def gt_problem(key, P=4):
    poses, disps, intr = make_scene(key, P)
    ii, jj = neighbourhood_graph(P, 2)
    intr_full = jnp.broadcast_to(intr, (P, 4))
    target, valid = projective_transform(
        poses[None], disps[None], intr_full[None], ii, jj
    )
    weight = jnp.ones_like(target)
    return poses, disps, intr, ii, jj, target[0], weight[0] * valid[0]


def mean_residual(poses, disps, intr, ii, jj, target):
    intr_full = jnp.broadcast_to(intr, (poses.shape[0], 4))
    coords, valid = projective_transform(
        poses[None], disps[None], intr_full[None], ii, jj
    )
    r = (target - coords[0]) * valid[0]
    return float(jnp.mean(jnp.abs(r)))


class TestDenseBA:
    def test_two_view_convergence(self):
        key = jax.random.PRNGKey(0)
        poses, disps, intr, ii, jj, target, weight = gt_problem(key)
        P = poses.shape[0]

        # perturb everything except the gauge-fixing first pose
        kp = jax.random.PRNGKey(1)
        dxi = 0.02 * jax.random.normal(kp, (P, 6)).at[0].set(0.0)
        poses0 = lie.se3_retr(poses, dxi)
        disps0 = disps * (1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(2), disps.shape))

        r0 = mean_residual(poses0, disps0, intr, ii, jj, target)
        eta = 1e-5 * jnp.ones((1, P, H, W))
        intr_full = jnp.broadcast_to(intr, (P, 4))
        p, d = poses0[None], disps0[None]
        for _ in range(10):
            p, d = BA(target[None], weight[None], eta, p, d, intr_full[None], ii, jj, fixedp=1)
        r1 = mean_residual(p[0], d[0], intr, ii, jj, target)
        assert r1 < 0.05 * r0, (r0, r1)

    def test_moba_convergence(self):
        key = jax.random.PRNGKey(3)
        poses, disps, intr, ii, jj, target, weight = gt_problem(key)
        P = poses.shape[0]
        dxi = 0.02 * jax.random.normal(jax.random.PRNGKey(4), (P, 6)).at[0].set(0.0)
        poses0 = lie.se3_retr(poses, dxi)

        r0 = mean_residual(poses0, disps, intr, ii, jj, target)
        eta = jnp.zeros((1, P, H, W))
        intr_full = jnp.broadcast_to(intr, (P, 4))
        p = poses0[None]
        for _ in range(10):
            p = MoBA(target[None], weight[None], eta, p, disps[None], intr_full[None], ii, jj, fixedp=1)
        r1 = mean_residual(p[0], disps, intr, ii, jj, target)
        assert r1 < 0.05 * r0, (r0, r1)

    def test_gradients_finite(self):
        key = jax.random.PRNGKey(5)
        poses, disps, intr, ii, jj, target, weight = gt_problem(key)
        P = poses.shape[0]
        eta = 1e-4 * jnp.ones((1, P, H, W))
        intr_full = jnp.broadcast_to(intr, (P, 4))

        def loss(w):
            p, d = BA(target[None], w[None], eta, poses[None], disps[None], intr_full[None], ii, jj)
            return jnp.sum(p[..., :3] ** 2) + jnp.sum(d ** 2)

        g = jax.grad(loss)(weight)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_cholesky_failure_returns_zero(self):
        """All-zero weights -> singular system -> no NaNs, zero update."""
        key = jax.random.PRNGKey(6)
        poses, disps, intr, ii, jj, target, _ = gt_problem(key)
        P = poses.shape[0]
        weight = jnp.zeros((len(ii), H, W, 2))
        eta = jnp.zeros((1, P, H, W))
        intr_full = jnp.broadcast_to(intr, (P, 4))
        p, d = BA(target[None], weight[None], eta, poses[None], disps[None], intr_full[None],
                  ii, jj, ep=0.0, lm=0.0)
        assert np.all(np.isfinite(np.asarray(p)))
        assert np.all(np.isfinite(np.asarray(d)))


class TestSolverParity:
    """ba_solve (scalable inference driver) vs BA (dense reference path)."""

    def test_one_iteration_matches_dense(self):
        key = jax.random.PRNGKey(7)
        poses, disps, intr, ii, jj, target, weight = gt_problem(key)
        P = poses.shape[0]
        dxi = 0.02 * jax.random.normal(jax.random.PRNGKey(8), (P, 6)).at[0].set(0.0)
        poses0 = lie.se3_retr(poses, dxi)
        disps0 = disps * 1.05

        eta = 1e-4 * jnp.ones((P, H, W))
        intr_full = jnp.broadcast_to(intr, (P, 4))

        # lm=0: the dense path damps H before the Schur subtraction (reference
        # chol.py:56) while the solver damps after (droid_kernels.cu:1406);
        # with lm=0 the two damping orders coincide exactly.
        p_dense, d_dense = BA(
            target[None], weight[None], eta[None],
            poses0[None], disps0[None], intr_full[None], ii, jj,
            fixedp=1, min_depth=0.2, lm=0.0,
        )

        be, bm = schur_pairs(np.asarray(ii), P)
        free = jnp.arange(P) >= 1
        p_solve, d_solve = ba_solve(
            poses0, disps0, intr, jnp.zeros_like(disps0),
            target, weight, eta + 1e-7, jnp.asarray(ii), jnp.asarray(jj),
            free, jnp.asarray(be), jnp.asarray(bm),
            iterations=1, motion_only=False, min_depth=0.2, lm=0.0,
        )

        np.testing.assert_allclose(np.asarray(p_solve), np.asarray(p_dense[0]), atol=2e-4)
        # dense path clamps disps; mirror before comparing
        d_solve = jnp.maximum(jnp.where(d_solve > 10, 0.0, d_solve), 0.0)
        np.testing.assert_allclose(np.asarray(d_solve), np.asarray(d_dense[0]), atol=2e-4)

    def test_motion_only_matches_moba(self):
        key = jax.random.PRNGKey(9)
        poses, disps, intr, ii, jj, target, weight = gt_problem(key)
        P = poses.shape[0]
        dxi = 0.02 * jax.random.normal(jax.random.PRNGKey(10), (P, 6)).at[0].set(0.0)
        poses0 = lie.se3_retr(poses, dxi)

        eta = jnp.zeros((1, P, H, W))
        intr_full = jnp.broadcast_to(intr, (P, 4))
        p_dense = MoBA(target[None], weight[None], eta, poses0[None], disps[None],
                       intr_full[None], ii, jj, fixedp=1, min_depth=0.2)

        be, bm = schur_pairs(np.asarray(ii), P)
        free = jnp.arange(P) >= 1
        p_solve, _ = ba_solve(
            poses0, disps, intr, jnp.zeros_like(disps),
            target, weight, eta[0], jnp.asarray(ii), jnp.asarray(jj),
            free, jnp.asarray(be), jnp.asarray(bm),
            iterations=1, motion_only=True, min_depth=0.2,
        )
        np.testing.assert_allclose(np.asarray(p_solve), np.asarray(p_dense[0]), atol=2e-4)

    def test_solver_convergence(self):
        key = jax.random.PRNGKey(11)
        poses, disps, intr, ii, jj, target, weight = gt_problem(key)
        P = poses.shape[0]
        dxi = 0.02 * jax.random.normal(jax.random.PRNGKey(12), (P, 6)).at[0].set(0.0)
        poses0 = lie.se3_retr(poses, dxi)
        disps0 = disps * 1.1

        r0 = mean_residual(poses0, disps0, intr, ii, jj, target)
        be, bm = schur_pairs(np.asarray(ii), P)
        free = jnp.arange(P) >= 1
        p, d = ba_solve(
            poses0, disps0, intr, jnp.zeros_like(disps0),
            target, weight, 1e-5 * jnp.ones((P, H, W)),
            jnp.asarray(ii), jnp.asarray(jj), free, jnp.asarray(be), jnp.asarray(bm),
            iterations=10, motion_only=False, min_depth=0.2,
        )
        r1 = mean_residual(p, d, intr, ii, jj, target)
        assert r1 < 0.05 * r0, (r0, r1)

    def test_rgbd_prior_pulls_disps(self):
        key = jax.random.PRNGKey(13)
        poses, disps, intr, ii, jj, target, weight = gt_problem(key)
        P = poses.shape[0]
        disps_sens = disps * 1.3  # sensor says depths are different
        be, bm = schur_pairs(np.asarray(ii), P)
        free = jnp.arange(P) >= 1
        _, d = ba_solve(
            poses, disps, intr, disps_sens,
            target, 0.0 * weight, 1e-4 * jnp.ones((P, H, W)),
            jnp.asarray(ii), jnp.asarray(jj), free, jnp.asarray(be), jnp.asarray(bm),
            iterations=3, motion_only=False, min_depth=0.2,
        )
        # with zero image weight the prior alone should move disps toward sensor
        err0 = float(jnp.mean(jnp.abs(disps - disps_sens)))
        err1 = float(jnp.mean(jnp.abs(d - disps_sens)))
        assert err1 < 0.1 * err0


class TestStereoEdges:
    def test_stereo_self_edge_only_affects_depth(self):
        """Self edges must not move poses, only disparities."""
        key = jax.random.PRNGKey(14)
        poses, disps, intr, _, _, _, _ = gt_problem(key)
        P = poses.shape[0]
        ii = np.arange(P, dtype=np.int32)
        jj = np.arange(P, dtype=np.int32)
        intr_full = jnp.broadcast_to(intr, (P, 4))
        target, valid = projective_transform(
            poses[None], (disps * 1.2)[None], intr_full[None], ii, jj
        )
        weight = jnp.ones_like(target) * valid

        be, bm = schur_pairs(ii, P)
        free = jnp.arange(P) >= 1
        p, d = ba_solve(
            poses, disps, intr, jnp.zeros_like(disps),
            target[0], weight[0], 1e-5 * jnp.ones((P, H, W)),
            jnp.asarray(ii), jnp.asarray(jj), free, jnp.asarray(be), jnp.asarray(bm),
            iterations=2, motion_only=False, min_depth=0.2,
        )
        np.testing.assert_allclose(np.asarray(p), np.asarray(poses), atol=1e-5)
        # disparities moved toward the 1.2x target
        assert float(jnp.mean(jnp.abs(d - 1.2 * disps))) < float(
            jnp.mean(jnp.abs(disps - 1.2 * disps))
        )
