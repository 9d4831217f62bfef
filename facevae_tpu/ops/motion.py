"""Dense motion-field construction from keypoint pairs.

Parity with /root/reference/utils.py:139-179: K+1 heatmap differences, K+1
sparse 3D motion fields with jacobian Rs @ Rd^-1, and per-keypoint trilinear
warps of the (compressed) appearance volume.

TPU notes: the (K+1)-way warp is the FLOP/bandwidth hog of MFE.  Layouts are
channel-last ([N,D,H,W,C]); the warp folds the K+1 axis into the batch so one
big grid_sample_3d runs instead of K+1 small ones.
"""
from __future__ import annotations

import jax.numpy as jnp

from facevae_tpu.ops.geometry import make_coordinate_grid_3d
from facevae_tpu.ops.heatmap import kp2gaussian_3d, kp2gaussian_3d_cl
from facevae_tpu.ops.fast_warp import grid_sample_3d_fast, grid_sample_3d_multi


def create_heatmap_representations(fs: jnp.ndarray, kp_s: jnp.ndarray,
                                   kp_d: jnp.ndarray) -> jnp.ndarray:
    """Difference-of-gaussians heatmaps, with a leading zero channel.

    fs: [N,D,H,W,C] (only spatial size used); kp_*: [N,K,3].
    Returns [N,K+1,D,H,W] (reference returns [N,K+1,1,D,H,W]; the singleton
    channel axis is added by the caller when concatenating).
    Reference utils.py:139-149.
    """
    spatial = fs.shape[1:4]
    kp_s = kp_s.astype(jnp.float32)
    kp_d = kp_d.astype(jnp.float32)
    heat = kp2gaussian_3d(kp_d, spatial) - kp2gaussian_3d(kp_s, spatial)
    zeros = jnp.zeros(heat.shape[:1] + (1,) + heat.shape[2:], heat.dtype)
    return jnp.concatenate([zeros, heat], axis=1)


def create_heatmap_representations_cl(fs: jnp.ndarray, kp_s: jnp.ndarray,
                                      kp_d: jnp.ndarray) -> jnp.ndarray:
    """Channel-last variant: [N,D,H,W,K+1] with the zero channel first.

    Same per-element math as create_heatmap_representations (identical
    gaussians), built directly in the layout MFE's fused conv input uses so
    no K-axis transpose exists on the hot path."""
    spatial = fs.shape[1:4]
    kp_s = kp_s.astype(jnp.float32)
    kp_d = kp_d.astype(jnp.float32)
    heat = kp2gaussian_3d_cl(kp_d, spatial) - kp2gaussian_3d_cl(kp_s, spatial)
    zeros = jnp.zeros(heat.shape[:-1] + (1,), heat.dtype)
    return jnp.concatenate([zeros, heat], axis=-1)


def create_sparse_motions(fs: jnp.ndarray, kp_s: jnp.ndarray, kp_d: jnp.ndarray,
                          Rs: jnp.ndarray, Rd: jnp.ndarray) -> jnp.ndarray:
    """K+1 candidate backward warps (driving -> source coordinates).

    fs: [N,D,H,W,C]; kp_*: [N,K,3]; Rs/Rd: [N,3,3].
    Returns [N,K+1,D,H,W,3] — channel 0 is the identity grid.
    motion_k(p) = Rs Rd^-1 (p - kp_d_k) + kp_s_k   (reference utils.py:152-165).
    """
    N = fs.shape[0]
    D, H, W = fs.shape[1:4]
    K = kp_s.shape[1]
    # warp coordinates are precision-critical: always fp32
    kp_s = kp_s.astype(jnp.float32)
    kp_d = kp_d.astype(jnp.float32)
    Rs = Rs.astype(jnp.float32)
    Rd = Rd.astype(jnp.float32)
    grid = make_coordinate_grid_3d((D, H, W), dtype=jnp.float32)       # [D,H,W,3]
    identity = jnp.broadcast_to(grid[None, None], (N, 1, D, H, W, 3))
    coords = grid[None, None] - kp_d[:, :, None, None, None, :]        # [N,K,D,H,W,3]
    jac = jnp.matmul(Rs, jnp.linalg.inv(Rd))                           # [N,3,3]
    # rotate each displacement: jac @ v  -> einsum over the coord axis
    coords = jnp.einsum("nij,nkdhwj->nkdhwi", jac, coords)
    driving_to_source = coords + kp_s[:, :, None, None, None, :]
    return jnp.concatenate([identity, driving_to_source], axis=1)


def create_deformed_source_image(fs: jnp.ndarray, sparse_motions: jnp.ndarray) -> jnp.ndarray:
    """Warp fs by each of the K+1 sparse motions.

    fs: [N,D,H,W,C]; sparse_motions: [N,K+1,D,H,W,3].
    Returns [N,K+1,D,H,W,C].  Reference utils.py:168-179 (grid_sample 3D,
    align_corners=True, zeros padding).
    """
    N, D, H, W, C = fs.shape
    K1 = sparse_motions.shape[1]
    grids = sparse_motions.reshape(N * K1, D, H, W, 3)
    # wide-row-gather warp (exact trilinear, zeros padding, align_corners=True);
    # the K+1 grids share the UN-repeated source volume (grids_per_source)
    warped = grid_sample_3d_fast(fs, grids, K1)
    return warped.reshape(N, K1, D, H, W, C)


def create_deformed_source_fused(fs: jnp.ndarray,
                                 sparse_motions: jnp.ndarray) -> jnp.ndarray:
    """Same warps as create_deformed_source_image, emitted directly in MFE's
    fused k-major channel layout [N,D,H,W,(K+1)*C] (the k-looped Pallas
    kernels read/write this layout with zero boundary transposes)."""
    K1 = sparse_motions.shape[1]
    return grid_sample_3d_multi(fs, sparse_motions, K1)


# ---------------------------------------------------------------------------
# Analytic sparse-motion construction.  Each candidate motion is affine in the
# voxel position: motion_k(p) = jac(p - kp_d_k) + kp_s_k  (identity for k=0),
# so the [N,K+1,D,H,W,3] tensor never needs to exist — its trailing dim of 3
# is tile-padded 42x on TPU and cost >100ms/step in construction, the
# deformation einsum, and the warp-gradient stack.  Instead:
#   - the warp consumes per-axis PIXEL coordinate planes [N,K+1,NV] built
#     from ONE [3,NV] jac product plus per-k scalar offsets;
#   - the mask-blended deformation reduces to mask-weighted KEYPOINT tables:
#       sum_k m_k motion_k = m_0 p + (sum_{k>=1} m_k)(jac p) + sum m_k b_k
#     with b_k = kp_s_k - jac kp_d_k  (a [N,K,3] table).
# ---------------------------------------------------------------------------


def motion_affine_params(kp_s: jnp.ndarray, kp_d: jnp.ndarray,
                         Rs: jnp.ndarray, Rd: jnp.ndarray):
    """jac [N,3,3] = Rs Rd^-1 and offsets b [N,K,3] = kp_s - jac kp_d
    (fp32; reference utils.py:152-165 semantics)."""
    kp_s = kp_s.astype(jnp.float32)
    kp_d = kp_d.astype(jnp.float32)
    jac = jnp.matmul(Rs.astype(jnp.float32),
                     jnp.linalg.inv(Rd.astype(jnp.float32)))
    b = kp_s - jnp.einsum("nij,nkj->nki", jac, kp_d)
    return jac, b


def sparse_motion_pixel_coords(spatial, jac: jnp.ndarray, b: jnp.ndarray,
                               include_identity: bool = True):
    """Pixel-space coordinate planes (cgx, cgy, cgz) [N,K+1,NV] for
    warp_multi_pixel, channel 0 = identity.  Differentiable in (jac, b).

    include_identity=False omits the k=0 row ([N,K,NV]): the identity warp
    samples at exactly integer pixel coordinates, i.e. it's a COPY of the
    source — callers can concatenate the source directly and skip 1/(K+1)
    of the warp work (models/mfe.py)."""
    D, H, W = spatial
    N, K, _ = b.shape
    NV = D * H * W
    grid = make_coordinate_grid_3d((D, H, W), dtype=jnp.float32).reshape(NV, 3)
    q = jnp.einsum("nij,vj->niv", jac, grid)                    # [N,3,NV]
    scale = jnp.asarray([(W - 1) * 0.5, (H - 1) * 0.5, (D - 1) * 0.5],
                        jnp.float32)

    def axis(a):
        moved = (q[:, None, a, :] + (b[..., a] + 1.0)[..., None]) * scale[a]
        if not include_identity:
            return moved
        ident = (grid[:, a] + 1.0) * scale[a]                   # [NV]
        return jnp.concatenate(
            [jnp.broadcast_to(ident[None, None], (N, 1, NV)), moved], axis=1)

    return axis(0), axis(1), axis(2)


def blend_deformation(mask: jnp.ndarray, jac: jnp.ndarray, b: jnp.ndarray):
    """deformation [N,D,H,W,3] = sum_k mask_k * motion_k without the
    [N,K+1,D,H,W,3] tensor; mask [N,D,H,W,K+1] (softmaxed, fp32)."""
    N, D, H, W, K1 = mask.shape
    grid = make_coordinate_grid_3d((D, H, W), dtype=jnp.float32)  # [D,H,W,3]
    jacp = jnp.einsum("nij,dhwj->ndhwi", jac, grid)
    m0 = mask[..., 0:1]
    rest = mask[..., 1:]
    offsets = jnp.einsum("ndhwk,nkc->ndhwc", rest, b)
    return m0 * grid[None] + rest.sum(-1, keepdims=True) * jacp + offsets
