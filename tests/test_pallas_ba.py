"""Pallas fused BA system builder vs the pure-XLA reference blocks.

This is the XLA/Pallas analog of the reference's cuda_ba/py_ba seam
(SURVEY.md §4.3) — the two system builders must agree to float tolerance.
Runs the kernel in interpreter mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from droid_slam_reserch_tpu import lie
from droid_slam_reserch_tpu.ba.system import build_system_blocks
from droid_slam_reserch_tpu.geom import neighbourhood_graph
from droid_slam_reserch_tpu.geom.projective import relative_poses
from droid_slam_reserch_tpu.ops.pallas_ba import build_system_blocks_pallas

H, W = 8, 16


def make_problem(key, P=4, stereo=False):
    ks = jax.random.split(key, 4)
    xi = jnp.concatenate(
        [0.1 * jax.random.normal(ks[0], (P, 3)), 0.03 * jax.random.normal(ks[1], (P, 3))],
        axis=-1,
    )
    poses = lie.se3_exp(xi)
    disps = 0.8 + 0.4 * jax.random.uniform(ks[2], (P, H, W))
    intr = jnp.array([20.0, 22.0, W / 2.0, H / 2.0])
    ii, jj = neighbourhood_graph(P, 2)
    if stereo:
        ii = np.concatenate([ii, np.arange(P)])
        jj = np.concatenate([jj, np.arange(P)])
    target = 0.5 + jax.random.uniform(ks[3], (len(ii), H, W, 2)) * jnp.array([W - 1.0, H - 1.0])
    weight = jax.random.uniform(jax.random.fold_in(key, 9), (len(ii), H, W, 2))
    return poses, disps, intr, ii, jj, target, weight


def _compare(stereo):
    key = jax.random.PRNGKey(0 if not stereo else 1)
    poses, disps, intr, ii, jj, target, weight = make_problem(key, stereo=stereo)
    P = poses.shape[0]
    intr_full = jnp.broadcast_to(intr, (P, 4))

    ref = build_system_blocks(
        target[None], weight[None], poses[None], disps[None], intr_full[None],
        ii, jj, min_depth=0.25,
    )

    Gij = relative_poses(poses[None], ii, jj)[0]
    R = lie.quat_to_matrix(Gij[:, 3:7])
    t = Gij[:, :3]
    pose_mask = jnp.asarray(ii != jj)

    out = build_system_blocks_pallas(
        target.transpose(0, 3, 1, 2), weight.transpose(0, 3, 1, 2),
        R, t, disps[jnp.asarray(ii)], intr, pose_mask,
        min_depth=0.25, interpret=True,
    )

    for k in ("Hii", "Hij", "Hji", "Hjj", "vi", "vj", "Ei", "Ej", "Ck", "wk"):
        a = np.asarray(ref[k][0])
        b = np.asarray(out[k])
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=2e-4 * scale, err_msg=k)


def test_pallas_blocks_match_xla_mono():
    _compare(stereo=False)


def test_pallas_blocks_match_xla_stereo():
    _compare(stereo=True)
