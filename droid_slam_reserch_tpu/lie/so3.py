"""SO3 as xyzw quaternions — pure JAX.

Semantics mirror reference src/droid_kernels.cu:58-132 (actSO3, expSO3) and
the upstream lietorch SO3 type; all functions broadcast over leading dims.
"""
import jax.numpy as jnp


def quat_mul(q, p):
    """Hamilton product q*p, xyzw layout (reference droid_kernels.cu:886-889)."""
    qx, qy, qz, qw = jnp.moveaxis(q, -1, 0)
    px, py, pz, pw = jnp.moveaxis(p, -1, 0)
    return jnp.stack(
        [
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py + qy * pw + qz * px - qx * pz,
            qw * pz + qz * pw + qx * py - qy * px,
            qw * pw - qx * px - qy * py - qz * pz,
        ],
        axis=-1,
    )


def quat_inv(q):
    """Conjugate (unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q, X):
    """Rotate 3-vector X by unit quaternion q (reference droid_kernels.cu:58-68)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, X)
    return X + qw * uv + jnp.cross(qv, uv)


def quat_normalize(q):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, 1e-12)
    # canonical sign: qw >= 0 not enforced (reference keeps raw sign)
    return q


def so3_exp(phi):
    """Axis-angle (3,) -> quaternion xyzw (reference droid_kernels.cu:110-132)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < 1e-8
    # Taylor branches identical to the reference's cutoffs.  The sqrt argument
    # is guarded so the *gradient* stays finite at theta = 0 (sqrt'(0) = inf).
    imag_t = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_p4
    real_t = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_p4
    theta_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    imag_f = jnp.sin(0.5 * theta_safe) / theta_safe
    real_f = jnp.cos(0.5 * theta_safe)
    imag = jnp.where(small, imag_t, imag_f)
    real = jnp.where(small, real_t, real_f)
    return jnp.concatenate([imag * phi, real], axis=-1)


def so3_log(q):
    """Quaternion xyzw -> axis-angle (3,)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # ensure shortest path: flip sign so qw >= 0
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sign
    qw = qw * sign
    nv_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = nv_sq < 1e-14
    nv_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(nv_sq), nv_sq))
    qw_clamped = jnp.clip(qw, -1.0, 1.0)
    theta = 2.0 * jnp.arctan2(nv_safe, qw_clamped)
    # small-angle: theta/sin(theta/2) ~ 2/qw * (1 + nv^2/(6 qw^2))
    scale_f = theta / nv_safe
    scale_t = 2.0 / jnp.maximum(qw, 1e-12) * (1.0 - nv_sq / (3.0 * qw * qw))
    scale = jnp.where(small, scale_t, scale_f)
    return scale * qv


def quat_to_matrix(q):
    """Unit quaternion xyzw -> 3x3 rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """3x3 rotation matrix -> quaternion xyzw (Shepperd's method, branchless)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _stack(x, y, z, w):
        return jnp.stack([x, y, z, w], axis=-1)

    q0 = _stack(m21 - m12, m02 - m20, m10 - m01, 1.0 + tr)
    q1 = _stack(1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12)
    q2 = _stack(m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21, m02 - m20)
    q3 = _stack(m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11, m10 - m01)

    cases = jnp.stack([q0, q1, q2, q3], axis=-2)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cases, idx[..., None, None].repeat(4, -1), axis=-2)
    q = q.squeeze(-2)
    return quat_normalize(q)
