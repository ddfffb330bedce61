"""Pallas TPU kernel: fused per-edge BA system builder.

The analog of the reference's hottest CUDA kernel,
projective_transform_kernel (src/droid_kernels.cu:176-424): one grid program
per factor-graph edge computes the weighted reprojection residual and the
analytic Jacobians per pixel ON THE FLY, reducing straight into the 12x12
pose Hessian block, 12-vector rhs, pose-depth couplings, and depth diagonal
— the [N, HW, 2, 6] Jacobian tensors the pure-XLA path materializes
(ba/system.py) never exist.

Inputs are pre-gathered per edge on the XLA side (relative poses as rotation
matrices + translations, source-frame disparities); all per-pixel math is
VPU elementwise, and the J^T W J reductions are small MXU matmuls.

Conventions identical to ba/system.py / the CUDA kernel: 0.001 weight scale,
zero weight behind min_depth, pose terms zeroed on stereo self-edges while
depth terms keep full weight.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(params_ref, disps_ref, target_ref, weight_ref,
            H_ref, v_ref, E_ref, C_ref, w_ref, *, HP, WP):
    p = params_ref[0, 0]  # [24]: R(9), t(3), fx, fy, cx, cy, pose_mask,
    #                             min_depth, w_scale (scalars ride the params
    #                             vector so they may be jit tracers)
    R00, R01, R02 = p[0], p[1], p[2]
    R10, R11, R12 = p[3], p[4], p[5]
    R20, R21, R22 = p[6], p[7], p[8]
    tx, ty, tz = p[9], p[10], p[11]
    fx, fy, cx, cy = p[12], p[13], p[14], p[15]
    pose_mask = p[16]
    min_depth = p[17]
    w_scale = p[18]

    d_i = disps_ref[0]          # [H, W]
    # Mosaic only lowers integer iota; convert to f32 after
    u = jax.lax.broadcasted_iota(jnp.int32, (HP, WP), 1).astype(jnp.float32)
    v = jax.lax.broadcasted_iota(jnp.int32, (HP, WP), 0).astype(jnp.float32)

    X = (u - cx) / fx
    Y = (v - cy) / fy

    # actSE3 on homogeneous [X, Y, 1, d] (droid_kernels.cu:70-77)
    x1 = R00 * X + R01 * Y + R02 + d_i * tx
    y1 = R10 * X + R11 * Y + R12 + d_i * ty
    z1 = R20 * X + R21 * Y + R22 + d_i * tz
    h = d_i

    valid = z1 > min_depth
    dz = jnp.where(valid, 1.0 / jnp.where(valid, z1, 1.0), 0.0)
    d2 = dz * dz

    wu = jnp.where(valid, w_scale * weight_ref[0, 0], 0.0)
    wv = jnp.where(valid, w_scale * weight_ref[0, 1], 0.0)
    ru = target_ref[0, 0] - (fx * x1 * dz + cx)
    rv = target_ref[0, 1] - (fy * y1 * dz + cy)

    zero = jnp.zeros_like(dz)

    def row_terms(f, a1, a2, which_x):
        """Jacobians for one residual row (x: which_x=1, y: 0)."""
        if which_x:
            Jj = [f * h * dz, zero, -f * x1 * h * d2,
                  -f * x1 * y1 * d2, f * (1.0 + x1 * x1 * d2), -f * y1 * dz]
            Jz = f * (tx * dz - tz * x1 * d2)
        else:
            Jj = [zero, f * h * dz, -f * y1 * h * d2,
                  -f * (1.0 + y1 * y1 * d2), f * x1 * y1 * d2, f * x1 * dz]
            Jz = f * (ty * dz - tz * y1 * d2)
        # Ji = -AdjT(Gij) Jj  (droid_kernels.cu:79-94 with u = a_lin x t)
        al0, al1, al2 = Jj[0], Jj[1], Jj[2]
        aa0 = Jj[3] + (al1 * tz - al2 * ty)  # a_ang - t x a_lin = a_ang + a_lin x t
        aa1 = Jj[4] + (al2 * tx - al0 * tz)
        aa2 = Jj[5] + (al0 * ty - al1 * tx)
        Ji = [
            -(R00 * al0 + R10 * al1 + R20 * al2),
            -(R01 * al0 + R11 * al1 + R21 * al2),
            -(R02 * al0 + R12 * al1 + R22 * al2),
            -(R00 * aa0 + R10 * aa1 + R20 * aa2),
            -(R01 * aa0 + R11 * aa1 + R21 * aa2),
            -(R02 * aa0 + R12 * aa1 + R22 * aa2),
        ]
        return Ji + Jj, Jz

    def stack16(J12):
        """[HW, 16] Jacobian matrix (12 tangent cols padded to 16)."""
        return jnp.stack(J12 + [zero, zero, zero, zero], axis=-1).reshape(HP * WP, 16)

    Jx12, Jzx = row_terms(fx, None, None, 1)
    Jy12, Jzy = row_terms(fy, None, None, 0)

    # depth diagonal + rhs keep full (unmasked) weight
    C_ref[0] = wu * Jzx * Jzx + wv * Jzy * Jzy
    w_ref[0] = wu * ru * Jzx + wv * rv * Jzy

    # pose terms use the stereo-masked weight
    wpu = wu * pose_mask
    wpv = wv * pose_mask
    Jx = stack16(Jx12)
    Jy = stack16(Jy12)

    H_ref[0] = jax.lax.dot_general(
        Jx * wpu.reshape(-1, 1), Jx, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        Jy * wpv.reshape(-1, 1), Jy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    v_ref[0] = jax.lax.dot_general(
        (wpu * ru).reshape(1, -1), Jx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        (wpv * rv).reshape(1, -1), Jy, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # pose-depth coupling: E[k, :] = sum_rows wp * Jz * J[:, k]
    E_ref[0] = (
        jnp.swapaxes(Jx, 0, 1) * (wpu * Jzx).reshape(1, -1)
        + jnp.swapaxes(Jy, 0, 1) * (wpv * Jzy).reshape(1, -1)
    )


def build_system_blocks_pallas(
    target, weight, Gij_R, Gij_t, disps_i, intrinsics, pose_mask,
    min_depth=0.25, w_scale=0.001, interpret=False,
):
    """Per-edge GN blocks via the fused Pallas kernel.

    target/weight: [N, 2, H, W]; Gij_R: [N, 3, 3]; Gij_t: [N, 3];
    disps_i: [N, H, W] (source-frame disparities); intrinsics: [4];
    pose_mask: [N] (0 on stereo self-edges).
    Returns dict with Hii/Hij/Hji/Hjj [N,6,6], vi/vj [N,6], Ei/Ej [N,6,HW],
    Ck/wk [N,HW] — same conventions as ba.system.build_system_blocks.
    """
    N, _, H, W = target.shape
    HW = H * W

    params = jnp.concatenate(
        [
            Gij_R.reshape(N, 9),
            Gij_t.reshape(N, 3),
            jnp.broadcast_to(intrinsics, (N, 4)),
            pose_mask.reshape(N, 1).astype(jnp.float32),
            jnp.broadcast_to(jnp.asarray(min_depth, jnp.float32), (N, 1)),
            jnp.broadcast_to(jnp.asarray(w_scale, jnp.float32), (N, 1)),
            jnp.zeros((N, 5), jnp.float32),
        ],
        axis=1,
    ).reshape(N, 1, 24)  # [N, 1, 24] (TPU block tiling needs 2D-compatible trailing dims)

    kernel = functools.partial(_kernel, HP=H, WP=W)
    Hb, vb, Eb, Cb, wb = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 1, 24), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, H, W), lambda e: (e, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, H, W), lambda e: (e, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 16, 16), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, HW), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 16, 16), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, 16), jnp.float32),
            jax.ShapeDtypeStruct((N, 16, HW), jnp.float32),
            jax.ShapeDtypeStruct((N, H, W), jnp.float32),
            jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        ],
        interpret=interpret,
    )(params, disps_i, target, weight)

    v12 = vb[:, 0, :12]
    return {
        "Hii": Hb[:, 0:6, 0:6],
        "Hij": Hb[:, 0:6, 6:12],
        "Hji": Hb[:, 6:12, 0:6],
        "Hjj": Hb[:, 6:12, 6:12],
        "vi": v12[:, 0:6],
        "vj": v12[:, 6:12],
        "Ei": Eb[:, 0:6, :],
        "Ej": Eb[:, 6:12, :],
        "Ck": Cb.reshape(N, HW),
        "wk": wb.reshape(N, HW),
    }
