"""Point clouds from SLAM state — pure JAX + host export.

- backproject_points: the iproj_kernel analog (reference
  droid_kernels.cu:779-850, used by visualization.py:106)
- depth_filter: multi-view depth consistency counter (reference
  droid_kernels.cu:661-775, used by visualization.py:110-115)
- export_ply / reconstruction_pointcloud: offline dump (the vis_*.py analog)
"""
import numpy as np

from ..lie import se3_act, se3_inv


def backproject_points(poses, disps, intrinsics):
    """Back-project all pixels to world-frame 3D points.

    poses: [P, 7] world-to-camera; disps: [P, H, W]; intrinsics: [4] at disp
    resolution.  Returns points [P, H, W, 3].
    """
    import jax.numpy as jnp

    P, H, W = disps.shape
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    d = jnp.maximum(disps, 1e-6)
    X = jnp.stack(
        [
            jnp.broadcast_to((x - cx) / fx, d.shape) / d,
            jnp.broadcast_to((y - cy) / fy, d.shape) / d,
            1.0 / d,
            jnp.ones_like(d),
        ],
        axis=-1,
    )
    Ginv = se3_inv(poses)
    pts = se3_act(Ginv[:, None, None, :], X)
    return pts[..., :3]


def depth_filter(poses, disps, intrinsics, ix, thresh):
    """Count neighbours agreeing with each pixel's depth (reference
    droid_kernels.cu:661-775): project keyframe ix's pixels into the 6
    neighbours {ix-1, ix-2, ix-3, ix+3, ix+4, ix+5}; a neighbour agrees if
    any of the 4 integer corners at the landing point has
    |1/d_proj - 1/d_corner| < thresh.

    poses [P,7], disps [P,H,W], intrinsics [4], ix [K] frame indices,
    thresh [K].  Returns counts [K, H, W].
    """
    import jax.numpy as jnp

    from ..lie import se3_mul

    P, H, W = disps.shape
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ix = jnp.asarray(ix)
    thresh = jnp.asarray(thresh)

    counts = jnp.zeros((len(ix), H, W))
    for neigh in (-1, -2, -3, 3, 4, 5):
        jx = ix + neigh
        ok_frame = (jx >= 0) & (jx < P)
        jxc = jnp.clip(jx, 0, P - 1)
        Gij = se3_mul(poses[jxc], se3_inv(poses[ix]))

        di = disps[ix]
        Xi = jnp.stack(
            [jnp.broadcast_to((x - cx) / fx, di.shape),
             jnp.broadcast_to((y - cy) / fy, di.shape),
             jnp.ones_like(di), di],
            axis=-1,
        )
        Xj = se3_act(Gij[:, None, None, :], Xi)
        zj = jnp.where(Xj[..., 2] == 0, 1.0, Xj[..., 2])
        uj = fx * Xj[..., 0] / zj + cx
        vj = fy * Xj[..., 1] / zj + cy
        dj = Xj[..., 3] / zj

        u0 = jnp.floor(uj).astype(jnp.int32)
        v0 = jnp.floor(vj).astype(jnp.int32)
        inb = (u0 >= 0) & (v0 >= 0) & (u0 < W - 1) & (v0 < H - 1)
        u0c = jnp.clip(u0, 0, W - 2)
        v0c = jnp.clip(v0, 0, H - 2)

        dn = disps[jxc].reshape(len(ix), H * W)
        agree = jnp.zeros(di.shape, bool)
        for dv in (0, 1):
            for du in (0, 1):
                idx = (v0c + dv) * W + (u0c + du)
                dcorner = jnp.take_along_axis(dn, idx.reshape(len(ix), -1), axis=1).reshape(di.shape)
                safe = jnp.maximum(jnp.minimum(dj, dcorner), 1e-6)
                diff = jnp.abs(1.0 / jnp.maximum(dj, 1e-6) - 1.0 / jnp.maximum(dcorner, 1e-6))
                agree = agree | (diff < thresh[:, None, None])
        hit = agree & inb & ok_frame[:, None, None]
        counts = counts + hit.astype(jnp.float32)
    return counts


def reconstruction_pointcloud(state, filter_thresh=0.005, filter_count=2):
    """Colored, filtered point cloud from a session state dict.

    Mirrors the visualizer's masking (reference visualization.py:106-120):
    keep points whose depth beats the mean-disp threshold and agrees with
    >= filter_count neighbours.
    """
    import jax.numpy as jnp

    poses = jnp.asarray(state["poses"])
    disps = jnp.asarray(state["disps"])
    intr = jnp.asarray(state["intrinsics"][0])
    P = len(poses)

    pts = np.asarray(backproject_points(poses, disps, intr))
    thresh = filter_thresh * np.ones(P) * np.asarray(jnp.mean(disps))
    counts = np.asarray(depth_filter(poses, disps, intr, np.arange(P), thresh))

    disps_np = np.asarray(disps)
    masks = (counts >= filter_count) & (
        disps_np > 0.5 * disps_np.mean(axis=(1, 2), keepdims=True)
    )

    images = state["images"]
    H8, W8 = disps_np.shape[1:]
    colors = images[:, 3::8, 3::8][:, :H8, :W8, ::-1] / 255.0  # BGR -> RGB

    return pts[masks], colors[masks]


def export_ply(path, points, colors=None):
    """Write an ascii PLY point cloud (offline vis_*.py analog)."""
    points = np.asarray(points).reshape(-1, 3)
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if colors is not None:
            colors = (np.asarray(colors).reshape(-1, 3) * 255).astype(np.uint8)
            for p, c in zip(points, colors):
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c[0]} {c[1]} {c[2]}\n")
        else:
            for p in points:
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
