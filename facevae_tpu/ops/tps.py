"""Random affine + thin-plate-spline warp for the equivariance constraint.

Parity with the reference `Transform` (/root/reference/trainer.py:91-129,
originally from FOMM).  The reference draws numpy/torch RNG inside forward;
here parameters are drawn explicitly from a PRNG key (jit-safe) and carried
in a small pytree, so a training step stays a pure function.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from facevae_tpu.ops.geometry import make_coordinate_grid_2d
from facevae_tpu.ops.grid_sample import grid_sample_2d


class TransformParams(NamedTuple):
    theta: jnp.ndarray           # [N,2,3] affine (eye + noise)
    control_points: jnp.ndarray  # [1,P*P,2]
    control_params: jnp.ndarray  # [N,1,P*P]


def random_transform_params(key: jax.Array, bs: int, *, sigma_affine: float = 0.05,
                            sigma_tps: float = 0.005, points_tps: int = 5,
                            dtype=jnp.float32) -> TransformParams:
    """Reference trainer.py:97-104."""
    k1, k2 = jax.random.split(key)
    eye = jnp.eye(2, 3, dtype=dtype)[None]
    theta = eye + sigma_affine * jax.random.normal(k1, (bs, 2, 3), dtype)
    cp = make_coordinate_grid_2d((points_tps, points_tps), dtype).reshape(1, -1, 2)
    cparams = sigma_tps * jax.random.normal(k2, (bs, 1, points_tps * points_tps), dtype)
    return TransformParams(theta, cp, cparams)


def warp_coordinates(tp: TransformParams, coordinates: jnp.ndarray) -> jnp.ndarray:
    """coordinates: [B,M,2] (or [1,M,2] broadcast over batch) -> [N,M,2].

    affine + TPS radial term r^2 log r with L1 radial distance
    (reference trainer.py:112-129 uses |dx|+|dy| inside the kernel).
    """
    theta = tp.theta[:, None]                                   # [N,1,2,3]
    transformed = (jnp.matmul(theta[..., :2], coordinates[..., None])[..., 0]
                   + theta[..., 2])                              # [N,M,2]
    distances = jnp.abs(
        coordinates[:, :, None, :] - tp.control_points[:, None, :, :]
    ).sum(-1)                                                    # [B,M,P*P]
    radial = distances ** 2 * jnp.log(distances + 1e-6)
    radial = (radial * tp.control_params).sum(axis=2)[..., None]  # [N,M,1]
    return transformed + radial


def transform_frame(tp: TransformParams, frame: jnp.ndarray,
                    compute_dtype=None) -> jnp.ndarray:
    """Warp frame [N,H,W,C] by the (inverse-sampled) TPS grid.

    Reference trainer.py:106-110: grid_sample 2D, align_corners=True,
    reflection padding.

    With compute_dtype=bfloat16 AND a fitting Pallas plan (TPU), the warp
    takes the one-hot MXU path: reflection is applied to the UNNORMALIZED
    coordinates up front (pre-reflected coords make reflection padding plain
    interior sampling — same _reflect formula as grid_sample_2d), then the
    warp runs through the fused multi-warp machinery as a D=1 volume.
    Everywhere else (fp32, CPU fallback) the EXACT fp32 gather runs on the
    unquantized frame — parity and the bf16-vs-fp32 A/B stay clean."""
    N, H, W, C = frame.shape
    grid = make_coordinate_grid_2d((H, W), jnp.float32).reshape(1, H * W, 2)
    grid = warp_coordinates(tp, grid).reshape(N, H, W, 2)
    if compute_dtype == jnp.bfloat16:
        from facevae_tpu.ops.fast_warp import warp_multi_pixel, _multi_plan
        from facevae_tpu.ops.grid_sample import _reflect
        x = frame.astype(jnp.bfloat16)[:, None]              # [N,1,H,W,C]
        if _multi_plan(x, 1, H * W) is not None:
            def px(g, n):
                p = (g + 1.0) * 0.5 * (n - 1)
                return jnp.clip(_reflect(p, 0.0, float(n - 1)),
                                0.0, float(n - 1))
            gx = px(grid[..., 0], W).reshape(N, 1, H * W)
            gy = px(grid[..., 1], H).reshape(N, 1, H * W)
            out = warp_multi_pixel(x, gx, gy, jnp.zeros_like(gx), (1, H, W))
            return out.reshape(N, H, W, C).astype(jnp.bfloat16)
    return grid_sample_2d(frame.astype(jnp.float32), grid,
                          align_corners=True, padding_mode="reflection")
