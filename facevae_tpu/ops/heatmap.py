"""Heatmap <-> keypoint conversions (softmax heatmaps, soft-argmax, gaussians).

Behavioral parity with /root/reference/utils.py:106-136.  These are reduction/
broadcast-heavy VPU ops; XLA fuses the exp/sum chains, so no custom kernel is
needed — the win on TPU comes from keeping them inside the surrounding jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from facevae_tpu.ops.geometry import make_coordinate_grid_2d, make_coordinate_grid_3d


def out2heatmap(out: jnp.ndarray, temperature: float = 0.1) -> jnp.ndarray:
    """Softmax over all spatial positions per (batch, keypoint) channel.

    out: [N,K,...spatial...] -> same shape, softmax(out/T) over spatial dims.
    Reference utils.py:106-111.
    """
    shape = out.shape
    flat = out.reshape(shape[0], shape[1], -1)
    heat = jax.nn.softmax(flat / temperature, axis=2)
    return heat.reshape(shape)


def heatmap2kp(heatmap: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax: expected grid coordinate under the heatmap.

    heatmap: [N,K,D,H,W] -> kp [N,K,3] (x_w, y_h, z_d in [-1,1]).
    Reference utils.py:114-118.
    """
    grid = make_coordinate_grid_3d(heatmap.shape[2:], dtype=heatmap.dtype)
    # contract spatial dims: [N,K,D,H,W] x [D,H,W,3] -> [N,K,3]
    return jnp.einsum("nkdhw,dhwc->nkc", heatmap, grid)


def out2heatmap_cl(out: jnp.ndarray, temperature: float = 0.1) -> jnp.ndarray:
    """Channel-last variant: out [N,D,H,W,K] -> softmax over (D,H,W) per (n,k).

    Computed in fp32 regardless of input dtype: heatmap mass and soft-argmax
    coordinates are precision-critical (bf16 coordinates are half-pixel off)."""
    shape = out.shape
    flat = out.reshape(shape[0], -1, shape[-1]).astype(jnp.float32)
    heat = jax.nn.softmax(flat / temperature, axis=1)
    return heat.reshape(shape)


def heatmap2kp_cl(heatmap: jnp.ndarray) -> jnp.ndarray:
    """Channel-last soft-argmax: [N,D,H,W,K] -> [N,K,3] (fp32)."""
    heatmap = heatmap.astype(jnp.float32)
    grid = make_coordinate_grid_3d(heatmap.shape[1:4], dtype=jnp.float32)
    return jnp.einsum("ndhwk,dhwc->nkc", heatmap, grid)


def kp2gaussian_3d_cl(kp: jnp.ndarray, spatial_size, kp_variance: float = 0.01) -> jnp.ndarray:
    """Channel-last gaussian rendering: [N,K,3] -> [N,D,H,W,K]."""
    grid = make_coordinate_grid_3d(spatial_size, dtype=kp.dtype)      # [D,H,W,3]
    diff = grid[None, :, :, :, None, :] - kp[:, None, None, None, :, :]
    return jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1) / kp_variance)


def kp2gaussian_2d_cl(kp: jnp.ndarray, spatial_size, kp_variance: float = 0.01) -> jnp.ndarray:
    """Channel-last gaussian rendering: [N,K,2] -> [N,H,W,K]."""
    grid = make_coordinate_grid_2d(spatial_size, dtype=kp.dtype)      # [H,W,2]
    diff = grid[None, :, :, None, :] - kp[:, None, None, :, :]
    return jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1) / kp_variance)


def kp2gaussian_2d(kp: jnp.ndarray, spatial_size, kp_variance: float = 0.01) -> jnp.ndarray:
    """Isotropic gaussian bumps at keypoint (x,y) locations.

    kp: [N,K,2] -> [N,K,H,W].  Reference utils.py:121-127.
    """
    grid = make_coordinate_grid_2d(spatial_size, dtype=kp.dtype)      # [H,W,2]
    diff = grid[None, None] - kp[:, :, None, None, :]                 # [N,K,H,W,2]
    return jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1) / kp_variance)


def kp2gaussian_3d(kp: jnp.ndarray, spatial_size, kp_variance: float = 0.01) -> jnp.ndarray:
    """kp: [N,K,3] -> [N,K,D,H,W].  Reference utils.py:130-136."""
    grid = make_coordinate_grid_3d(spatial_size, dtype=kp.dtype)      # [D,H,W,3]
    diff = grid[None, None] - kp[:, :, None, None, None, :]           # [N,K,D,H,W,3]
    return jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1) / kp_variance)
