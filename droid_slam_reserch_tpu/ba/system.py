"""Per-edge Gauss-Newton blocks for dense BA.

TPU-native analog of projective_transform_kernel (reference
src/droid_kernels.cu:176-424): per factor-graph edge (ii, jj), computes the
weighted reprojection residual, pose Hessian blocks, rhs vectors, pose-depth
couplings, and depth diagonal — here as batched einsums over pixels (which
XLA fuses / maps onto the MXU) instead of one CUDA block per edge.

Conventions (identical to the reference kernel):
- weights are scaled by 0.001 (droid_kernels.cu:305-306, geom/ba.py:43)
- pixels behind the camera (z < min_depth) get zero weight (:302-306)
- stereo self-edges (ii == jj) contribute **only** depth terms; their pose
  Jacobian contributions are zeroed (:323,356)
"""
import jax
import jax.numpy as jnp

from ..geom.projective import projective_transform


def build_system_blocks(
    target,
    weight,
    poses,
    disps,
    intrinsics,
    ii,
    jj,
    group="se3",
    min_depth=0.2,
    w_scale=0.001,
    stereo_self_edges=True,
):
    """Build per-edge GN blocks.

    target, weight: [B, N, H, W, 2]; poses: [B, P, 7|8]; disps: [B, P, H, W];
    intrinsics: [B, P, 4]; ii, jj: [N].

    Returns dict with per-edge blocks (D = manifold dim):
      Hii, Hij, Hji, Hjj: [B, N, D, D]     pose Hessian blocks
      vi, vj:             [B, N, D]        pose rhs
      Ei, Ej:             [B, N, D, HW]    pose-depth coupling (depth of frame ii)
      Ck:                 [B, N, HW]       depth diagonal
      wk:                 [B, N, HW]       depth rhs
      coords, valid:      reprojection + validity
    """
    B, N = target.shape[:2]
    H, W = disps.shape[-2:]
    HW = H * W

    coords, valid, (Ji, Jj, Jz) = projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=True, group=group, min_depth=min_depth
    )

    r = target - coords                      # [B,N,H,W,2]
    w = w_scale * valid * weight             # [B,N,H,W,2]

    # pose terms are disabled on stereo self-edges (fixed baseline transform)
    if stereo_self_edges:
        not_self = (ii != jj).astype(w.dtype)[None, :, None, None, None]
        wp = w * not_self
    else:
        wp = w

    Jz0 = Jz[..., 0]                         # [B,N,H,W,2]

    # HIGHEST precision: with the default single-bf16-pass MXU matmul these
    # contractions leave ~3e-3 relative error in the GN blocks on TPU
    # (measured on v5e vs a CPU fp32 oracle); the outputs are tiny so the
    # extra passes cost nothing.
    _hi = jax.lax.Precision.HIGHEST

    def hblock(Ja, Jb):
        return jnp.einsum("bnhwcx,bnhwc,bnhwcy->bnxy", Ja, wp, Jb,
                          precision=_hi)

    Hii = hblock(Ji, Ji)
    Hij = hblock(Ji, Jj)
    Hjj = hblock(Jj, Jj)
    Hji = jnp.swapaxes(Hij, -1, -2)

    vi = jnp.einsum("bnhwcx,bnhwc,bnhwc->bnx", Ji, wp, r, precision=_hi)
    vj = jnp.einsum("bnhwcx,bnhwc,bnhwc->bnx", Jj, wp, r, precision=_hi)

    Ei = jnp.einsum("bnhwcx,bnhwc,bnhwc->bnxhw", Ji, wp, Jz0, precision=_hi).reshape(B, N, -1, HW)
    Ej = jnp.einsum("bnhwcx,bnhwc,bnhwc->bnxhw", Jj, wp, Jz0, precision=_hi).reshape(B, N, -1, HW)

    # depth terms keep full weight on stereo self-edges (droid_kernels.cu:320-321)
    Ck = jnp.einsum("bnhwc,bnhwc->bnhw", w, Jz0 * Jz0).reshape(B, N, HW)
    wk = jnp.einsum("bnhwc,bnhwc->bnhw", w * r, Jz0).reshape(B, N, HW)

    return {
        "Hii": Hii, "Hij": Hij, "Hji": Hji, "Hjj": Hjj,
        "vi": vi, "vj": vj,
        "Ei": Ei, "Ej": Ej,
        "Ck": Ck, "wk": wk,
        "coords": coords, "valid": valid,
    }
