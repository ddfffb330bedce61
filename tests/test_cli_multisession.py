"""The full multisession pipeline driven through its CLI commands, as a
user would run it (reference Euroc_Multisession_Stereo/: KeyFramesAndRawData
-> AdjustCoordinates -> BackendAllMaps -> Whole_Evaluate):

  stage 1  demo --reconstruction_path      (session export)
  stage 2  multisession-align              (spec JSON, loop replay, joint BA)
  stage 3  multisession                    (subsample + fuse)
  stage 4  multisession-evaluate           (per-sequence fill, concat ATE)

Two sessions of the same synthetic trajectory, the second stored in a frame
displaced by a known SE3 T: alignment must recover ~T, and the fused map's
concatenated ATE must beat the unaligned concatenation."""
import json
import os
import shutil

import numpy as np
import pytest

from droid_slam_reserch_tpu.cli import main
from synth_scenes import textured_image

FLAGS = ["--image_size", "64", "96", "--buffer", "32", "--warmup", "5",
         "--filter_thresh", "-1", "--keyframe_thresh", "0",
         "--frontend_window", "8", "--frontend_thresh", "32"]


def _make_imagedir(root, n_frames=12):
    import cv2

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for t in range(n_frames):
        cv2.imwrite(str(root / f"{t:04d}.png"), textured_image(64, 96, t, rng))
    calib = root.parent / "calib.txt"
    calib.write_text("60.0 60.0 48.0 32.0\n")
    return root, calib


@pytest.mark.slow
def test_multisession_cli_pipeline(tmp_path, capsys):
    from droid_slam_reserch_tpu import lie
    from droid_slam_reserch_tpu.eval import evaluate_ate
    import jax.numpy as jnp

    imgdir, calib = _make_imagedir(tmp_path / "frames", n_frames=12)

    # ---- stage 1: session A export through the demo CLI -----------------
    s0_dir = tmp_path / "sessions" / "a"
    main(["demo", "--imagedir", str(imgdir), "--calib", str(calib),
          "--target_area", "6144", "--reconstruction_path", str(s0_dir),
          "--disable_backend", *FLAGS])
    s0 = dict(np.load(s0_dir / "reconstruction.npz", allow_pickle=True))
    n0 = len(s0["poses"])
    assert n0 == 12  # every frame keyframed

    # ---- fabricate session B: same map in a T-displaced world frame -----
    T_known = np.asarray(
        lie.se3_exp(jnp.array([2.0, -1.0, 0.5, 0.05, -0.1, 0.08])),
        np.float32,
    )
    s1 = dict(s0)
    s1["poses"] = np.asarray(
        lie.se3_mul(jnp.asarray(T_known)[None], jnp.asarray(s0["poses"]))
    )
    s1_dir = tmp_path / "sessions" / "b"
    s1_dir.mkdir(parents=True)
    np.savez_compressed(s1_dir / "reconstruction.npz", **s1)

    # ---- stage 2: align B into A's frame via the CLI --------------------
    spec = {"groups": [{
        "seed_idx": [0, 1, 2, 3, 4],
        "old_idx": [5, 6, 7, 8, 9],
        "frame_idx": [5, 6, 7, 8, 9],
        "imagedir": str(imgdir), "calib": str(calib),
    }]}
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(spec))
    align_out = tmp_path / "align"
    main(["multisession-align", "--first", str(s0_dir / "reconstruction.npz"),
          "--second", str(s1_dir / "reconstruction.npz"),
          "--spec", str(spec_file), "--out", str(align_out), *FLAGS])

    aligned = np.load(align_out / "aligned.npz")
    T_rec = np.asarray(aligned["T"])
    # the recovered transform matches the fabricated displacement — loosely:
    # with random weights the loop replay re-estimates frames 5..9 with
    # ~0.5 m of noise vs session A's original estimates, so the tolerance
    # is "clearly found the ~2.3 m transform", not metric accuracy
    np.testing.assert_allclose(T_rec[:3], T_known[:3], atol=1.0)
    assert abs(float(np.dot(T_rec[3:7], T_known[3:7]))) > 0.9
    # aligned B is far closer to A's frame than the unaligned offset (2.3 m)
    mean_err = np.linalg.norm(aligned["poses"][:, :3] - s0["poses"][:, :3],
                              axis=1).mean()
    assert mean_err < 1.2
    assert (align_out / "aligned_joint.npz").exists()  # joint backend ran

    # ---- stage 3: fuse through the CLI ----------------------------------
    fused_sessions = tmp_path / "sessions2"
    shutil.copytree(s0_dir, fused_sessions / "a")
    s1b = dict(s1)
    s1b["poses"] = np.asarray(aligned["poses"])
    (fused_sessions / "b").mkdir()
    np.savez_compressed(fused_sessions / "b" / "reconstruction.npz", **s1b)
    fused_out = tmp_path / "fused"
    main(["multisession", "--sessions", str(fused_sessions),
          "--out", str(fused_out), "--subsample", "2", *FLAGS])
    fused = dict(np.load(fused_out / "fused.npz", allow_pickle=True))
    assert len(fused["poses"]) == 12  # 6 + 6 subsampled keyframes
    assert np.isfinite(fused["poses"]).all()

    # ---- stage 4: concatenated evaluation through the CLI ---------------
    gt_rows = np.array(
        [[float(t), 0.05 * t, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0] for t in range(12)]
    )
    gt_file = tmp_path / "gt.txt"
    np.savetxt(gt_file, gt_rows)
    eval_spec = {"sequences": [
        {"start": 0, "stop": 6, "imagedir": str(imgdir),
         "calib": str(calib), "gt": str(gt_file)},
        {"start": 6, "stop": 12, "imagedir": str(imgdir),
         "calib": str(calib), "gt": str(gt_file)},
    ]}
    eval_spec_file = tmp_path / "eval_spec.json"
    eval_spec_file.write_text(json.dumps(eval_spec))
    traj_out = tmp_path / "trajs"
    capsys.readouterr()  # drop earlier output
    main(["multisession-evaluate", "--fused", str(fused_out / "fused.npz"),
          "--spec", str(eval_spec_file), "--out", str(traj_out), *FLAGS])

    out = capsys.readouterr().out
    res = None
    for line in out.splitlines():
        if line.strip().startswith("{"):
            d = json.loads(line)
            if "ate" in d:
                res = d
    assert res is not None and res["sequences"] == 2
    ate_fused = res["ate"]["rmse"]
    assert np.isfinite(ate_fused)
    assert (traj_out / "traj_0.npy").exists()
    assert (traj_out / "traj_1.npy").exists()

    # ---- the aligned/fused concatenation beats the unaligned one --------
    def kf_positions(poses):
        # world-to-camera -> camera positions
        return np.asarray(lie.se3_inv(jnp.asarray(poses)))[:, :3]

    stamps = np.asarray(s0["tstamps"], np.float64)
    est_unaligned = np.concatenate([
        np.concatenate([stamps[:, None], kf_positions(s0["poses"]),
                        np.tile([0, 0, 0, 1.0], (n0, 1))], axis=1),
        np.concatenate([stamps[:, None], kf_positions(s1["poses"]),
                        np.tile([0, 0, 0, 1.0], (n0, 1))], axis=1),
    ])
    gt_concat = np.concatenate([gt_rows, gt_rows])
    res_unaligned = evaluate_ate(
        est_unaligned, gt_concat, align=True, correct_scale=True
    )
    assert ate_fused < res_unaligned["rmse"]
