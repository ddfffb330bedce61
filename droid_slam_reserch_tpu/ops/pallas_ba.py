"""Pallas TPU kernel: fused per-edge BA system builder.

The analog of the reference's hottest CUDA kernel,
projective_transform_kernel (src/droid_kernels.cu:176-424): one grid program
per factor-graph edge computes the weighted reprojection residual and the
analytic Jacobians per pixel ON THE FLY, reducing straight into the 12x12
pose Hessian block, 12-vector rhs, pose-depth couplings, and depth diagonal
— the [N, HW, 2, 6] Jacobian tensors the pure-XLA path materializes
(ba/system.py) never exist.

Layout (the part Mosaic cares about): every per-pixel quantity lives in a
[1, HW] row — pixels on LANES — so there is never a sublane<->lane shape
cast (a [H, W] -> [HW, 1] reshape is unsupported on TPU).  The 12 Jacobian
components are written as rows of a [16, HW] VMEM scratch, and the J^T W J
reductions contract the lane dimension on the MXU.  Scalar edge parameters
ride in SMEM.

Conventions identical to ba/system.py / the CUDA kernel: 0.001 weight scale,
zero weight behind min_depth, pose terms zeroed on stereo self-edges while
depth terms keep full weight.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(params_ref, uv_ref, disps_ref, target_ref, weight_ref,
            H_ref, v_ref, E_ref, C_ref, w_ref, jx_s, jy_s):
    """One edge: params_ref SMEM [1,1,24]; uv_ref [1,2,HW] pixel grid;
    disps_ref [1,1,HW]; target/weight [1,2,HW]; outputs H [1,16,16],
    v [1,1,16], E [1,16,HW], C/w [1,1,HW]; jx_s/jy_s [16,HW] scratch."""

    def P(k):
        return params_ref[0, 0, k]

    R00, R01, R02 = P(0), P(1), P(2)
    R10, R11, R12 = P(3), P(4), P(5)
    R20, R21, R22 = P(6), P(7), P(8)
    tx, ty, tz = P(9), P(10), P(11)
    fx, fy, cx, cy = P(12), P(13), P(14), P(15)
    pose_mask = P(16)
    min_depth = P(17)
    w_scale = P(18)

    u = uv_ref[0, 0:1, :]     # [1, HW]
    v = uv_ref[0, 1:2, :]
    d_i = disps_ref[0, 0:1, :]

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

    wu = jnp.where(valid, w_scale * weight_ref[0, 0:1, :], 0.0)
    wv = jnp.where(valid, w_scale * weight_ref[0, 1:2, :], 0.0)
    ru = target_ref[0, 0:1, :] - (fx * x1 * dz + cx)
    rv = target_ref[0, 1:2, :] - (fy * y1 * dz + cy)

    zero = jnp.zeros_like(dz)

    def row_terms(f, which_x):
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
        aa0 = Jj[3] + (al1 * tz - al2 * ty)
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

    Jx12, Jzx = row_terms(fx, 1)
    Jy12, Jzy = row_terms(fy, 0)

    # depth diagonal + rhs keep full (unmasked) weight
    C_ref[0, 0:1, :] = wu * Jzx * Jzx + wv * Jzy * Jzy
    w_ref[0, 0:1, :] = wu * ru * Jzx + wv * rv * Jzy

    # fill the [16, HW] Jacobian matrices row by row (no shape casts)
    for k in range(12):
        jx_s[k : k + 1, :] = Jx12[k]
        jy_s[k : k + 1, :] = Jy12[k]
    for k in range(12, 16):
        jx_s[k : k + 1, :] = zero
        jy_s[k : k + 1, :] = zero

    # pose terms use the stereo-masked weight
    wpu = wu * pose_mask
    wpv = wv * pose_mask
    Jx = jx_s[:]
    Jy = jy_s[:]

    # H = J^T W J and v = J^T W r, contracting the lane (pixel) dim on MXU.
    # HIGHEST precision: the default single-bf16-pass f32 matmul leaves
    # ~4e-3 relative error in the Hessian blocks (measured on v5e), which a
    # damped GN iteration amplifies; the 16x16 outputs make the extra
    # passes free.
    lanes = (((1,), (1,)), ((), ()))
    hi = jax.lax.Precision.HIGHEST
    H_ref[0] = jax.lax.dot_general(
        Jx * wpu, Jx, lanes, preferred_element_type=jnp.float32, precision=hi
    ) + jax.lax.dot_general(
        Jy * wpv, Jy, lanes, preferred_element_type=jnp.float32, precision=hi
    )
    v_ref[0] = jax.lax.dot_general(
        wpu * ru, Jx, lanes, preferred_element_type=jnp.float32, precision=hi
    ) + jax.lax.dot_general(
        wpv * rv, Jy, lanes, preferred_element_type=jnp.float32, precision=hi
    )
    # pose-depth coupling: E[k, :] = wp * Jz * J[k, :]
    E_ref[0] = Jx * (wpu * Jzx) + Jy * (wpv * Jzy)


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
    ).reshape(N, 1, 24)

    # pixel grid as a [1, 2, HW] input: no in-kernel iota, pixels on lanes
    u = jnp.tile(jnp.arange(W, dtype=jnp.float32), (H,))
    v = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
    uv = jnp.stack([u, v], axis=0).reshape(1, 2, HW)

    Hb, vb, Eb, Cb, wb = pl.pallas_call(
        _kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 1, 24), lambda e: (e, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, HW), lambda e: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HW), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, HW), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, HW), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 16, 16), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, HW), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HW), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HW), lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 16, 16), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, 16), jnp.float32),
            jax.ShapeDtypeStruct((N, 16, HW), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, HW), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, HW), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, HW), jnp.float32),
            pltpu.VMEM((16, HW), jnp.float32),
        ],
        interpret=interpret,
    )(params, uv, disps_i.reshape(N, 1, HW), target.reshape(N, 2, HW),
      weight.reshape(N, 2, HW))

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
