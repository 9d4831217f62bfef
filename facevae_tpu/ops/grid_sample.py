"""Bilinear/trilinear grid sampling with torch-exact semantics.

XLA has no native grid_sample; this is the op that gates the whole model
(used by the 3D warp in MFE/Generator — reference utils.py:176 and
models.py:1103 — and the 2D TPS warp at trainer.py:110).  Implemented as
corner gathers with `jnp.take_along_axis` over a flattened spatial axis —
XLA lowers these to efficient dynamic-gathers on TPU.  The hot 3D training
path does NOT go through this module: ops/fast_warp.py re-expresses the
trilinear warp as one-hot matmuls and dispatches to the fused Pallas kernels
in ops/pallas/warp_mm.py on TPU (this gather formulation is the exact-fp32
fallback and the oracle in tests/test_fast_warp.py).

Semantics matched to torch.nn.functional.grid_sample:
  - align_corners=True:  ix = (gx + 1)/2 * (W - 1)
  - align_corners=False: ix = ((gx + 1) * W - 1)/2
  - padding_mode 'zeros': out-of-bounds corners contribute 0
  - padding_mode 'border': coordinates clamped to [0, size-1]
  - padding_mode 'reflection': coordinates reflected (about pixel centers for
    align_corners=True, about edges otherwise) then clamped.

Layout is channel-last: x [N,H,W,C] / [N,D,H,W,C]; grid channel order is
(x=W, y=H[, z=D]) — identical to torch's grid convention.
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(coord: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """Reflect coordinates into [lo, hi] (torch's reflect_coordinates)."""
    span = hi - lo
    # guard degenerate span (size-1 == 0)
    span = max(span, 1e-12) if isinstance(span, float) else span
    coord = jnp.abs(coord - lo)
    coord = coord % (2.0 * span)
    coord = jnp.where(coord > span, 2.0 * span - coord, coord)
    return coord + lo


def _apply_padding(coord: jnp.ndarray, size: int, padding_mode: str,
                   align_corners: bool) -> jnp.ndarray:
    if padding_mode == "reflection":
        if align_corners:
            coord = _reflect(coord, 0.0, float(size - 1))
        else:
            coord = _reflect(coord, -0.5, size - 0.5)
        coord = jnp.clip(coord, 0.0, float(size - 1))
    elif padding_mode == "border":
        coord = jnp.clip(coord, 0.0, float(size - 1))
    return coord


def grid_sample_2d(x: jnp.ndarray, grid: jnp.ndarray, *, align_corners: bool = True,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """x: [N,H,W,C], grid: [N,Ho,Wo,2] -> [N,Ho,Wo,C]."""
    N, H, W, C = x.shape
    _, Ho, Wo, _ = grid.shape
    gdtype = x.dtype
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)
    gx = _apply_padding(gx, W, padding_mode, align_corners)
    gy = _apply_padding(gy, H, padding_mode, align_corners)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0

    out = jnp.zeros((N, Ho, Wo, C), dtype=jnp.float32)
    flat = x.reshape(N, H * W, C).astype(jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            cx = x0 + dx
            cy = y0 + dy
            w = ((tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty))
            if padding_mode == "zeros":
                valid = ((cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1))
                w = jnp.where(valid, w, 0.0)
            ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
            iy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
            idx = (iy * W + ix).reshape(N, Ho * Wo)
            vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
            out = out + vals.reshape(N, Ho, Wo, C) * w[..., None]
    return out.astype(gdtype)


def grid_sample_3d(x: jnp.ndarray, grid: jnp.ndarray, *, align_corners: bool = True,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """x: [N,D,H,W,C], grid: [N,Do,Ho,Wo,3] (x,y,z order) -> [N,Do,Ho,Wo,C]."""
    N, D, H, W, C = x.shape
    _, Do, Ho, Wo, _ = grid.shape
    gdtype = x.dtype
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)
    gz = _unnormalize(grid[..., 2].astype(jnp.float32), D, align_corners)
    gx = _apply_padding(gx, W, padding_mode, align_corners)
    gy = _apply_padding(gy, H, padding_mode, align_corners)
    gz = _apply_padding(gz, D, padding_mode, align_corners)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    z0 = jnp.floor(gz)
    tx = gx - x0
    ty = gy - y0
    tz = gz - z0

    out = jnp.zeros((N, Do, Ho, Wo, C), dtype=jnp.float32)
    flat = x.reshape(N, D * H * W, C).astype(jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                cx = x0 + dx
                cy = y0 + dy
                cz = z0 + dz
                w = ((tx if dx else 1.0 - tx)
                     * (ty if dy else 1.0 - ty)
                     * (tz if dz else 1.0 - tz))
                if padding_mode == "zeros":
                    valid = ((cx >= 0) & (cx <= W - 1)
                             & (cy >= 0) & (cy <= H - 1)
                             & (cz >= 0) & (cz <= D - 1))
                    w = jnp.where(valid, w, 0.0)
                ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
                iy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
                iz = jnp.clip(cz, 0, D - 1).astype(jnp.int32)
                idx = ((iz * H + iy) * W + ix).reshape(N, Do * Ho * Wo)
                vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
                out = out + vals.reshape(N, Do, Ho, Wo, C) * w[..., None]
    return out.astype(gdtype)
