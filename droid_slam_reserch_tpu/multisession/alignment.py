"""SE3 map-to-map alignment (reference loop_detect.py:256-335,411-423)."""
import numpy as np

from ..lie import se3_inv, se3_mul


def compute_filtered_mean(rows):
    """Per-column mean after IQR outlier removal (reference :256-282).

    rows: [N, D] numpy array.  Returns [D].
    """
    rows = np.asarray(rows, np.float64)
    out = np.empty(rows.shape[1])
    for i in range(rows.shape[1]):
        col = rows[:, i]
        q1, q3 = np.quantile(col, 0.25), np.quantile(col, 0.75)
        iqr = q3 - q1
        keep = (col >= q1 - 1.5 * iqr) & (col <= q3 + 1.5 * iqr)
        out[i] = col[keep].mean() if keep.any() else col.mean()
    return out


def normalize_transform(T):
    """Renormalize the quaternion part of a 7-vector (reference
    AdjustCoordinates.py:174-178)."""
    T = np.asarray(T, np.float64).copy()
    q = T[3:7]
    T[3:7] = q / np.linalg.norm(q)
    return T


def estimate_alignment(old_poses, loop_poses):
    """Per-correspondence transforms T_k = P_old[k] * P_loop[k]^-1
    (reference AdjustCoordinates.py:165-167), IQR-filtered mean, quaternion
    renormalized.  Returns (T [7], rows [N,7])."""
    import jax.numpy as jnp

    rows = np.asarray(
        se3_mul(jnp.asarray(np.asarray(old_poses, np.float32)),
                se3_inv(jnp.asarray(np.asarray(loop_poses, np.float32))))
    )
    T = normalize_transform(compute_filtered_mean(rows))
    return T.astype(np.float32), rows


def transform_poses(T, poses, inverse=True):
    """Apply T to every pose: T^-1 * P (default, reference
    loop_detect.py:311-322 getTransformedPoses) or T * P (:324-335)."""
    import jax.numpy as jnp

    Tj = jnp.asarray(np.asarray(T, np.float32))
    P = jnp.asarray(np.asarray(poses, np.float32))
    if inverse:
        out = se3_mul(se3_inv(Tj)[None], P)
    else:
        out = se3_mul(Tj[None], P)
    return np.asarray(out)


def remove_outlier_rows(rows, thresh=2.0):
    """Drop rows whose translation deviates > thresh stds from the median
    (reference loop_detect.py:411-423 outlier row removal)."""
    rows = np.asarray(rows)
    t = rows[:, :3]
    med = np.median(t, axis=0)
    d = np.linalg.norm(t - med, axis=1)
    std = d.std() + 1e-8
    return rows[d < thresh * std] if (d < thresh * std).any() else rows
