"""Geometry tests: analytic Jacobians vs jax autodiff, stereo conventions.

This is the test the reference lacks entirely (SURVEY.md §4) — its analytic
Jacobians (reference geom/projective_ops.py:54-123) are only validated
end-to-end.  Here each Jacobian block is checked against jax.jacfwd.
"""
import jax
import jax.numpy as jnp
import numpy as np

from droid_slam_reserch_tpu import lie
from droid_slam_reserch_tpu.geom import (
    coords_grid,
    projective_transform,
    induced_flow,
    frame_distance,
)
from droid_slam_reserch_tpu.geom.projective import relative_poses


def make_problem(key, B=1, P=3, H=8, W=12, group="se3"):
    ks = jax.random.split(key, 3)
    if group == "se3":
        poses = lie.se3_exp(0.2 * jax.random.normal(ks[0], (B, P, 6)))
    else:
        poses = lie.sim3_exp(0.2 * jax.random.normal(ks[0], (B, P, 7)))
    disps = 0.5 + 0.5 * jax.random.uniform(ks[1], (B, P, H, W))
    intr = jnp.broadcast_to(jnp.array([24.0, 24.0, W / 2, H / 2]), (B, P, 4))
    return poses, disps, intr


def test_identity_projection_is_grid():
    poses = lie.se3_identity((1, 2))
    disps = jnp.ones((1, 2, 8, 12))
    intr = jnp.broadcast_to(jnp.array([24.0, 24.0, 6.0, 4.0]), (1, 2, 4))
    ii = np.array([0], dtype=np.int32)
    jj = np.array([1], dtype=np.int32)
    coords, valid = projective_transform(poses, disps, intr, ii, jj)
    grid = coords_grid(8, 12)
    np.testing.assert_allclose(coords[0, 0], grid, atol=1e-5)
    assert np.all(np.asarray(valid) == 1.0)


def test_induced_flow_zero_at_identity():
    poses = lie.se3_identity((1, 2))
    disps = jnp.ones((1, 2, 8, 12))
    intr = jnp.broadcast_to(jnp.array([24.0, 24.0, 6.0, 4.0]), (1, 2, 4))
    flow, valid = induced_flow(poses, disps, intr, np.array([0]), np.array([1]))
    np.testing.assert_allclose(flow, 0.0, atol=1e-5)


def test_stereo_self_edge_baseline():
    """ii == jj edges must use the fixed [-0.1, 0, 0] baseline transform
    (reference projective_ops.py:105)."""
    poses = lie.se3_exp(0.3 * jax.random.normal(jax.random.PRNGKey(0), (1, 2, 6)))
    disps = jnp.full((1, 2, 8, 12), 0.7)
    intr = jnp.broadcast_to(jnp.array([24.0, 24.0, 6.0, 4.0]), (1, 2, 4))
    ii = np.array([1], dtype=np.int32)
    jj = np.array([1], dtype=np.int32)
    coords, valid = projective_transform(poses, disps, intr, ii, jj)
    grid = coords_grid(8, 12)
    # x' = fx*(X - 0.1*d)/Z + cx with Z=1: shift of -fx*0.1*d
    expect_x = grid[..., 0] - 24.0 * 0.1 * 0.7
    np.testing.assert_allclose(coords[0, 0, ..., 0], expect_x, atol=1e-5)
    np.testing.assert_allclose(coords[0, 0, ..., 1], grid[..., 1], atol=1e-5)


class TestJacobians:
    def _check(self, group):
        key = jax.random.PRNGKey(42)
        poses, disps, intr = make_problem(key, group=group)
        ii = np.array([0, 1], dtype=np.int32)
        jj = np.array([1, 2], dtype=np.int32)
        D = 6 if group == "se3" else 7

        coords, valid, (Ji, Jj, Jz) = projective_transform(
            poses, disps, intr, ii, jj, jacobian=True, group=group
        )

        retr = lie.se3_retr if group == "se3" else lie.sim3_retr

        def coords_of_perturbation(xi, which):
            """perturb pose of edge-endpoint `which` (0 = ii side, 1 = jj side)."""
            p = poses
            idx = ii if which == 0 else jj
            # apply the same perturbation to the endpoint frame of every edge
            def f(xi_e, e):
                pp = p.at[:, idx[e]].set(retr(p[:, idx[e]], xi_e))
                c, _ = projective_transform(pp, disps, intr, ii, jj, group=group)
                return c[:, e]

            return f

        # analytic vs autodiff, edge by edge
        for e in range(2):
            for which, Jana in ((0, Ji), (1, Jj)):
                f = coords_of_perturbation(None, which)
                J_auto = jax.jacfwd(lambda xi: f(xi, e))(jnp.zeros(D))
                # J_auto: [B,H,W,2,D]; Jana[:, e]: [B,H,W,2,D]
                np.testing.assert_allclose(
                    np.asarray(J_auto),
                    np.asarray(Jana[:, e]),
                    atol=2e-3,
                    err_msg=f"group={group} edge={e} side={which}",
                )

        # depth jacobian
        def coords_of_disp(dd, e):
            d2 = disps.at[:, ii[e]].add(dd)
            c, _ = projective_transform(d2 and poses or poses, d2, intr, ii, jj, group=group)
            return c[:, e]

        for e in range(2):
            J_auto = jax.jacfwd(
                lambda dd: projective_transform(
                    poses, disps.at[:, ii[e]].add(dd), intr, ii, jj, group=group
                )[0][:, e]
            )(0.0)
            np.testing.assert_allclose(
                np.asarray(J_auto), np.asarray(Jz[:, e, ..., 0]), atol=2e-3
            )

    def test_se3(self):
        self._check("se3")

    def test_sim3(self):
        self._check("sim3")


def test_frame_distance_zero_motion():
    poses = lie.se3_identity((4,))
    disps = jnp.ones((4, 8, 12))
    intr = jnp.array([24.0, 24.0, 6.0, 4.0])
    d = frame_distance(poses, disps, intr, np.array([0, 1]), np.array([1, 2]))
    np.testing.assert_allclose(d, 0.0, atol=1e-4)


def test_frame_distance_increases_with_motion():
    intr = jnp.array([24.0, 24.0, 6.0, 4.0])
    disps = jnp.ones((3, 8, 12))
    small = jnp.stack([lie.se3_identity(), lie.se3_exp(jnp.array([0.05, 0, 0, 0, 0, 0.0])),
                       lie.se3_identity()])
    big = jnp.stack([lie.se3_identity(), lie.se3_exp(jnp.array([0.4, 0, 0, 0, 0, 0.0])),
                     lie.se3_identity()])
    ds = frame_distance(small, disps, intr, np.array([0]), np.array([1]))
    db = frame_distance(big, disps, intr, np.array([0]), np.array([1]))
    assert float(ds[0]) < float(db[0])
    assert float(ds[0]) > 0
