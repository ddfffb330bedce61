"""Pinhole projective geometry with analytic Jacobians — pure JAX.

Mirror of reference droid_slam/geom/projective_ops.py (iproj:18, proj:39,
actp:67, projective_transform:96, induced_flow:127) and of the distance
metric in reference src/droid_kernels.cu:518-657 (frame_distance_kernel).

Conventions (identical to the reference):
- pixel grid is (x, y) with x = column index, y = row index
- homogeneous points are [X, Y, 1, d] where d is inverse depth (disparity)
- stereo self-edges (ii == jj) use the fixed rectified baseline transform
  [-0.1, 0, 0, identity] (reference projective_ops.py:105,
  droid_kernels.cu:219-229)
- MIN_DEPTH = 0.2 on the differentiable path (reference projective_ops.py:6);
  the inference BA uses 0.25 (reference droid_kernels.cu:26) — pass min_depth.
"""
import jax.numpy as jnp

from ..lie import se3_mul, se3_inv, se3_act, se3_adjT, sim3_mul, sim3_inv, sim3_act, sim3_adjT

MIN_DEPTH = 0.2

STEREO_SE3 = jnp.array([-0.1, 0, 0, 0, 0, 0, 1], dtype=jnp.float32)
STEREO_SIM3 = jnp.array([-0.1, 0, 0, 0, 0, 0, 1, 1], dtype=jnp.float32)


def coords_grid(ht, wd, dtype=jnp.float32):
    """Pixel grid [ht, wd, 2] of (x, y) coordinates (reference :11-16)."""
    y, x = jnp.meshgrid(jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype), indexing="ij")
    return jnp.stack([x, y], axis=-1)


def _extract_intrinsics(intrinsics):
    """[..., 4] -> four [..., 1, 1] maps (fx, fy, cx, cy)."""
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    return fx, fy, cx, cy


def iproj(disps, intrinsics, jacobian=False):
    """Inverse projection: disps [..., H, W] -> homogeneous points [..., H, W, 4].

    reference projective_ops.py:18-37.
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = _extract_intrinsics(intrinsics)
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    x, y = grid[..., 0], grid[..., 1]
    i = jnp.ones_like(disps)
    X = (x - cx) / fx
    Y = (y - cy) / fy
    pts = jnp.stack([X * i, Y * i, i, disps], axis=-1)
    if jacobian:
        J = jnp.zeros_like(pts).at[..., -1].set(1.0)
        return pts, J
    return pts, None


def proj(Xs, intrinsics, jacobian=False, return_depth=False, min_depth=MIN_DEPTH):
    """Pinhole projection of homogeneous points [..., 4] (reference :39-65)."""
    fx, fy, cx, cy = _extract_intrinsics(intrinsics)
    X, Y, Z, D = jnp.moveaxis(Xs, -1, 0)
    Z = jnp.where(Z < 0.5 * min_depth, jnp.ones_like(Z), Z)
    d = 1.0 / Z
    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        coords = jnp.stack([x, y, D * d], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)
    if jacobian:
        o = jnp.zeros_like(d)
        proj_jac = jnp.stack(
            [fx * d, o, -fx * X * d * d, o,
             o, fy * d, -fy * Y * d * d, o],
            axis=-1,
        ).reshape(d.shape + (2, 4))
        return coords, proj_jac
    return coords, None


def actp(Gij, X0, jacobian=False, group="se3"):
    """Group action on homogeneous pointclouds (reference :67-94).

    Gij: [..., 7|8] (broadcast over the two trailing spatial dims of X0);
    X0: [..., H, W, 4].
    """
    G = Gij[..., None, None, :]
    if group == "se3":
        X1 = se3_act(G, X0)
    else:
        X1 = sim3_act(G, X0)
    if not jacobian:
        return X1, None

    X, Y, Z, d = jnp.moveaxis(X1, -1, 0)
    o = jnp.zeros_like(d)
    if group == "se3":
        Ja = jnp.stack(
            [d, o, o, o, Z, -Y,
             o, d, o, -Z, o, X,
             o, o, d, Y, -X, o,
             o, o, o, o, o, o],
            axis=-1,
        ).reshape(d.shape + (4, 6))
    else:
        Ja = jnp.stack(
            [d, o, o, o, Z, -Y, X,
             o, d, o, -Z, o, X, Y,
             o, o, d, Y, -X, o, Z,
             o, o, o, o, o, o, o],
            axis=-1,
        ).reshape(d.shape + (4, 7))
    return X1, Ja


def relative_poses(poses, ii, jj, group="se3", stereo=True):
    """Gij = poses[jj] * poses[ii]^-1 with stereo self-edge override.

    poses: [B, P, 7|8]; returns [B, N, 7|8].
    """
    if group == "se3":
        Gij = se3_mul(poses[:, jj], se3_inv(poses[:, ii]))
        if stereo:
            fixed = jnp.broadcast_to(STEREO_SE3.astype(Gij.dtype), Gij.shape)
            Gij = jnp.where((ii == jj)[None, :, None], fixed, Gij)
    else:
        Gij = sim3_mul(poses[:, jj], sim3_inv(poses[:, ii]))
        if stereo:
            fixed = jnp.broadcast_to(STEREO_SIM3.astype(Gij.dtype), Gij.shape)
            Gij = jnp.where((ii == jj)[None, :, None], fixed, Gij)
    return Gij


def projective_transform(
    poses,
    depths,
    intrinsics,
    ii,
    jj,
    jacobian=False,
    return_depth=False,
    group="se3",
    min_depth=MIN_DEPTH,
):
    """Map pixels of frames ii into frames jj (reference :96-125).

    poses: [B, P, 7|8], depths: [B, P, H, W] (inverse depth), intrinsics
    [B, P, 4], ii/jj: [N] int.  Returns (coords [B,N,H,W,2(+1)],
    valid [B,N,H,W,1]) and, with jacobian=True, (Ji, Jj, Jz).
    """
    X0, Jz = iproj(depths[:, ii], intrinsics[:, ii], jacobian=jacobian)
    Gij = relative_poses(poses, ii, jj, group=group)
    X1, Ja = actp(Gij, X0, jacobian=jacobian, group=group)
    x1, Jp = proj(
        X1, intrinsics[:, jj], jacobian=jacobian, return_depth=return_depth, min_depth=min_depth
    )

    valid = ((X1[..., 2] > min_depth) & (X0[..., 2] > min_depth)).astype(x1.dtype)
    valid = valid[..., None]

    if jacobian:
        # pose Jacobians: Jj directly, Ji via the dual adjoint (reference :115-123)
        Jj_out = jnp.matmul(Jp, Ja)
        G = Gij[..., None, None, None, :]
        if group == "se3":
            Ji_out = -se3_adjT(G, Jj_out)
            Jz_t = se3_act(Gij[..., None, None, :], Jz)
        else:
            Ji_out = -sim3_adjT(G, Jj_out)
            Jz_t = sim3_act(Gij[..., None, None, :], Jz)
        Jz_out = jnp.matmul(Jp, Jz_t[..., None])
        return x1, valid, (Ji_out, Jj_out, Jz_out)

    return x1, valid


def projmap(poses, disps, intrinsics, ii, jj, group="se3", min_depth=MIN_DEPTH):
    """Dense reprojection coords + validity per edge with the depth channel.

    API-parity twin of droid_backends.projmap (reference
    src/droid_kernels.cu:427-516 — unused by the reference's Python in this
    fork but part of the kernel API surface).
    """
    return projective_transform(
        poses, disps, intrinsics, ii, jj, return_depth=True,
        group=group, min_depth=min_depth,
    )


def induced_flow(poses, disps, intrinsics, ii, jj, group="se3"):
    """Optical flow induced by camera motion (reference :127-138)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj, group=group)
    return coords1[..., :2] - coords0, valid


def frame_distance(poses, disps, intrinsics, ii, jj, beta=0.3, min_depth=0.25):
    """Mean induced-flow magnitude between frame pairs.

    TPU-native equivalent of frame_distance_kernel (reference
    src/droid_kernels.cu:518-657): blends full-SE3 flow with
    translation-only flow by beta; returns 1000 where fewer than 75% of
    pixels land in front of the camera.

    poses: [P, 7]; disps: [P, H, W]; intrinsics: [4]; ii/jj: [N].
    Returns dist [N].
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    x, y = grid[..., 0], grid[..., 1]

    Gij = se3_mul(poses[jj], se3_inv(poses[ii]))  # [N, 7]
    d_i = disps[ii]  # [N, H, W]
    X = (x - cx) / fx
    Y = (y - cy) / fy
    Xi = jnp.stack([jnp.broadcast_to(X, d_i.shape), jnp.broadcast_to(Y, d_i.shape),
                    jnp.ones_like(d_i), d_i], axis=-1)

    def flow_mag(Xj):
        zj = Xj[..., 2]
        safe_z = jnp.where(zj == 0, jnp.ones_like(zj), zj)
        du = fx * (Xj[..., 0] / safe_z) + cx - x
        dv = fy * (Xj[..., 1] / safe_z) + cy - y
        mag = jnp.sqrt(du * du + dv * dv)
        ok = (zj > min_depth).astype(disps.dtype)
        return mag, ok

    # full SE3 flow
    Xj_full = se3_act(Gij[:, None, None, :], Xi)
    mag_f, ok_f = flow_mag(Xj_full)
    # translation-only flow
    t = Gij[:, None, None, :3]
    Xj_t = jnp.concatenate([Xi[..., :3] + d_i[..., None] * t, Xi[..., 3:]], axis=-1)
    mag_t, ok_t = flow_mag(Xj_t)

    npix = ht * wd
    total = beta * npix + (1.0 - beta) * npix
    valid = beta * jnp.sum(ok_f, axis=(-2, -1)) + (1.0 - beta) * jnp.sum(ok_t, axis=(-2, -1))
    accum = beta * jnp.sum(mag_f * ok_f, axis=(-2, -1)) + (1.0 - beta) * jnp.sum(
        mag_t * ok_t, axis=(-2, -1)
    )
    frac = valid / (total + 1e-8)
    dist = jnp.where(frac < 0.75, 1000.0, accum / jnp.maximum(valid, 1e-8))
    return dist
