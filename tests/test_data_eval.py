"""Data-layer and evaluation-metric tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from droid_slam_reserch_tpu import lie
from droid_slam_reserch_tpu.data import RGBDAugmentor, compute_distance_matrix_flow
from droid_slam_reserch_tpu.data.rgbd_utils import all_pairs_distance_matrix, loadtum
from droid_slam_reserch_tpu.eval import (
    ate_rmse,
    evaluate_ate,
    kitti_metrics,
    rpe,
    umeyama_alignment,
)


class TestUmeyama:
    def test_recovers_similarity(self):
        rng = np.random.RandomState(0)
        x = rng.randn(50, 3)
        R_gt = np.asarray(lie.quat_to_matrix(lie.so3_exp(jnp.array([0.3, -0.2, 0.5]))))
        s_gt, t_gt = 1.7, np.array([1.0, -2.0, 0.5])
        y = (s_gt * (R_gt @ x.T)).T + t_gt

        s, R, t = umeyama_alignment(x, y, with_scale=True)
        np.testing.assert_allclose(s, s_gt, rtol=1e-6)
        np.testing.assert_allclose(R, R_gt, atol=1e-6)
        np.testing.assert_allclose(t, t_gt, atol=1e-6)

    def test_ate_zero_after_alignment(self):
        rng = np.random.RandomState(1)
        gt = np.cumsum(rng.randn(30, 3) * 0.1, axis=0)
        R = np.asarray(lie.quat_to_matrix(lie.so3_exp(jnp.array([0.1, 0.2, -0.1]))))
        est = (2.0 * (R @ gt.T)).T + np.array([5, 5, 5])
        rmse_noscale, _ = ate_rmse(est, gt, align=True, correct_scale=False)
        rmse_scale, _ = ate_rmse(est, gt, align=True, correct_scale=True)
        assert rmse_scale < 1e-7
        assert rmse_noscale > 0.1  # scale error remains without scale correction

    def test_evaluate_ate_association(self):
        ts = np.arange(20, dtype=np.float64)
        gt = np.concatenate([ts[:, None], np.cumsum(np.ones((20, 3)), 0), np.tile([0, 0, 0, 1.0], (20, 1))], 1)
        est = gt.copy()
        est[:, 1:4] += 0.01
        res = evaluate_ate(est, gt, align=False)
        np.testing.assert_allclose(res["rmse"], np.sqrt(3) * 0.01, rtol=1e-6)
        assert res["matches"] == 20


def test_rpe_identity():
    T = np.tile(np.eye(4), (10, 1, 1))
    for i in range(10):
        T[i, :3, 3] = [i, 0, 0]
    t_err, r_err = rpe(T, T)
    assert t_err < 1e-12 and r_err < 1e-6


def test_kitti_metrics_zero_drift():
    gt = np.zeros((500, 3))
    gt[:, 0] = np.arange(500)  # 1 m per frame
    assert kitti_metrics(gt, gt, lengths=(100, 200)) < 1e-9


def test_flow_distance_matrix():
    key = jax.random.PRNGKey(0)
    N, h, w = 4, 6, 8
    # poses stored world-to-camera convention input (the fn inverts)
    poses = np.asarray(lie.se3_exp(0.05 * jax.random.normal(key, (N, 6))))
    disps = 0.5 + 0.5 * np.random.RandomState(0).rand(N, h, w).astype(np.float32)
    intr = np.tile(np.array([20.0, 20.0, w / 2, h / 2], np.float32), (N, 1))
    d = compute_distance_matrix_flow(poses, disps, intr, chunk=8)
    assert d.shape == (N, N)
    # self-pairs get the fixed stereo baseline (reference projective_ops.py:105):
    # expected flow ~ fx * 0.1 * mean disparity
    expect_diag = 20.0 * 0.1 * disps.mean(axis=(1, 2))
    np.testing.assert_allclose(np.diag(d), expect_diag, rtol=0.2)
    assert np.all(d[np.isfinite(d)] >= 0)
    np.testing.assert_allclose(d, d.T, rtol=1e-4)  # bidirectional metric


def test_all_pairs_distance_matrix():
    poses = np.asarray(lie.se3_exp(0.3 * jax.random.normal(jax.random.PRNGKey(1), (5, 6))))
    d = all_pairs_distance_matrix(poses)
    assert d.shape == (5, 5)
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)
    np.testing.assert_allclose(d, d.T, atol=1e-4)


def test_augmentor_shapes():
    rng = np.random.default_rng(0)
    aug = RGBDAugmentor(crop_size=(32, 48), rng=rng)
    images = rng.random((3, 48, 64, 3)).astype(np.float32) * 255
    disps = np.ones((3, 48, 64), np.float32)
    poses = np.zeros((3, 7), np.float32)
    intr = np.tile(np.array([40.0, 40.0, 32.0, 24.0]), (3, 1))
    im2, p2, d2, in2 = aug(images, poses, disps, intr)
    assert im2.shape == (3, 32, 48, 3)
    assert d2.shape == (3, 32, 48)
    assert in2.shape == (3, 4)


def test_loadtum(tmp_path):
    """Synthetic TUM-format directory round-trips through loadtum."""
    d = tmp_path
    n = 12
    with open(d / "rgb.txt", "w") as f:
        for i in range(n):
            f.write(f"{i}.0 rgb/{i:04d}.png\n")
    with open(d / "depth.txt", "w") as f:
        for i in range(n):
            f.write(f"{i}.0 depth/{i:04d}.png\n")
    with open(d / "groundtruth.txt", "w") as f:
        f.write("# header\n")
        for i in range(n):
            f.write(f"{i}.0 {i * 0.1} 0 0 0 0 0 1\n")
    images, depths, poses, intrinsics, tstamps = loadtum(str(d))
    assert len(images) == len(poses) == len(tstamps)
    assert len(images) == (n + 4) // 5  # ::5 subsampling
    np.testing.assert_allclose(poses[0][:3], [0, 0, 0], atol=1e-9)
