"""TUM-format loading and pairwise distance matrices
(reference data_readers/rgbd_utils.py:11-190)."""
import os.path as osp

import numpy as np

from ..geom import induced_flow
from ..lie import se3_inv, se3_log, se3_mul


def parse_list(filepath, skiprows=0):
    return np.loadtxt(filepath, delimiter=" ", dtype=np.str_, skiprows=skiprows)


def associate_frames(tstamp_image, tstamp_depth, tstamp_pose, max_dt=1.0):
    """Pair images, depths, and poses by timestamp (reference :16-33)."""
    associations = []
    for i, t in enumerate(tstamp_image):
        j = np.argmin(np.abs(tstamp_depth - t))
        if tstamp_pose is None:
            if np.abs(tstamp_depth[j] - t) < max_dt:
                associations.append((i, j))
        else:
            k = np.argmin(np.abs(tstamp_pose - t))
            if np.abs(tstamp_depth[j] - t) < max_dt and np.abs(tstamp_pose[k] - t) < max_dt:
                associations.append((i, j, k))
    return associations


def loadtum(datapath, frame_rate=-1):
    """Read TUM-RGBD-format video data (reference :35-88)."""
    if osp.isfile(osp.join(datapath, "groundtruth.txt")):
        pose_list = osp.join(datapath, "groundtruth.txt")
    elif osp.isfile(osp.join(datapath, "pose.txt")):
        pose_list = osp.join(datapath, "pose.txt")
    else:
        return None, None, None, None, None

    image_data = parse_list(osp.join(datapath, "rgb.txt"))
    depth_data = parse_list(osp.join(datapath, "depth.txt"))
    pose_data = parse_list(pose_list, skiprows=1)
    pose_vecs = pose_data[:, 1:].astype(np.float64)

    calib_path = osp.join(datapath, "calibration.txt")
    intrinsic = np.loadtxt(calib_path, delimiter=" ") if osp.isfile(calib_path) else None

    tstamp_image = image_data[:, 0].astype(np.float64)
    tstamp_depth = depth_data[:, 0].astype(np.float64)
    tstamp_pose = pose_data[:, 0].astype(np.float64)
    associations = associate_frames(tstamp_image, tstamp_depth, tstamp_pose)

    indicies = range(len(associations))[::5]
    images, poses, depths, intrinsics, tstamps = [], [], [], [], []
    for ix in indicies:
        (i, j, k) = associations[ix]
        images.append(osp.join(datapath, image_data[i, 1]))
        depths.append(osp.join(datapath, depth_data[j, 1]))
        poses.append(pose_vecs[k])
        tstamps.append(tstamp_image[i])
        if intrinsic is not None:
            intrinsics.append(intrinsic)
    return images, depths, poses, intrinsics, tstamps


def all_pairs_distance_matrix(poses, beta=2.5):
    """Pose-space distance matrix (reference :91-98)."""
    import jax.numpy as jnp

    poses = np.array(poses, dtype=np.float32)
    poses[:, :3] *= beta
    P = jnp.asarray(poses)
    rel = se3_mul(se3_inv(P[:, None]), P[None, :])
    return np.asarray(jnp.linalg.norm(se3_log(rel), axis=-1))


def compute_distance_matrix_flow(poses, disps, intrinsics, chunk=2048):
    """Bidirectional mean-flow distance matrix (reference :105-160).

    poses [N,7] (world-to-camera TUM [t,q] order), disps [N,h,w] subsampled,
    intrinsics [N,4] matching the disp resolution.
    """
    import jax.numpy as jnp

    N = len(poses)
    poses = jnp.asarray(np.asarray(poses, np.float32))
    poses = se3_inv(poses)  # reference uses SE3(poses).inv()
    disps = jnp.asarray(np.asarray(disps, np.float32))
    intrinsics = jnp.asarray(np.asarray(intrinsics, np.float32))

    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)

    MAX_FLOW = 100.0
    mat = np.zeros((N * N,), np.float32)
    for s in range(0, len(ii), chunk):
        ci = ii[s : s + chunk]
        cj = jj[s : s + chunk]
        flow1, val1 = induced_flow(poses[None], disps[None], intrinsics[None], ci, cj)
        flow2, val2 = induced_flow(poses[None], disps[None], intrinsics[None], cj, ci)
        # bidirectional weighted mean, flow clamped (reference :129-136)
        mag1 = jnp.clip(jnp.linalg.norm(flow1[0], axis=-1), None, MAX_FLOW)
        mag2 = jnp.clip(jnp.linalg.norm(flow2[0], axis=-1), None, MAX_FLOW)
        mag = jnp.concatenate([mag1.reshape(len(ci), -1), mag2.reshape(len(ci), -1)], -1)
        val = jnp.concatenate(
            [val1[0, ..., 0].reshape(len(ci), -1), val2[0, ..., 0].reshape(len(ci), -1)], -1
        )
        vmean = jnp.mean(val, -1)
        flo = jnp.sum(mag * val, -1) / jnp.maximum(jnp.sum(val, -1), 1e-8)
        d = jnp.where(vmean < 0.7, jnp.inf, flo)
        mat[s : s + chunk] = np.asarray(d)
    return mat.reshape(N, N)
