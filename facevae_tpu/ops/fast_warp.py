"""TPU-fast trilinear warp (exact grid_sample_3d semantics, align_corners=True,
zeros padding) built from wide-row gathers.

Why: XLA lowers per-voxel gathers to an element-row path that runs at ~2GB/s
on TPU, and the gather's VJP to an even slower scatter (~1GB/s) — together
they were 85% of the training step.  Row-granularity gathers run at
50-270GB/s (measured; bandwidth scales with row width).  So:

  forward:  for each of the 4 (z,y) corner pairs, gather the full source
            x-line (row of W*C floats) per output voxel — a fast wide-row
            gather — then reduce along x with a 2-nonzero weight vector on
            the VPU (one-hot compare + multiply + sum).  Chunked with
            lax.map so transients stay ~100MB.
  backward: custom VJP.  d/dsource is 4 wide-row scatter-adds of rank-1
            (w_x x dout) updates (~57GB/s); d/dgrid reuses the forward
            gathers (recomputed, not saved).

Numerics identical to ops.grid_sample.grid_sample_3d (verified in tests);
accumulation in fp32.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_CHUNK = 1 << 17     # voxels per chunk: 128K rows x 256B = 32MB transient (C=4)


def _coords(x_shape, grid, grids_per_source):
    """Unnormalize (align_corners=True) and split; returns flat per-voxel
    arrays + the SOURCE batch index per voxel (grid batch // grids_per_source
    — lets K+1 warps of the same volume share one un-repeated source)."""
    N, D, H, W, C = x_shape
    G = grid.shape[0]
    Do, Ho, Wo = grid.shape[1:4]
    assert G == N * grids_per_source, (G, N, grids_per_source)
    P = G * Do * Ho * Wo
    g = grid.reshape(P, 3).astype(jnp.float32)
    gx = (g[:, 0] + 1.0) * 0.5 * (W - 1)
    gy = (g[:, 1] + 1.0) * 0.5 * (H - 1)
    gz = (g[:, 2] + 1.0) * 0.5 * (D - 1)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (G, Do * Ho * Wo), 0).reshape(P)
    nidx = gidx // grids_per_source
    return gx, gy, gz, nidx


def _pad_chunks(arrs, chunk):
    P = arrs[0].shape[0]
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    out = []
    for a in arrs:
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        out.append(a.reshape(n_chunks, chunk) if a.ndim == 1
                   else a.reshape((n_chunks, chunk) + a.shape[1:]))
    return out, P


def _corner_terms(rows, nidx, gx, gy, gz, dz, dy, D, H, W, C):
    """Gather the (z0+dz, y0+dy) rows and produce (val, val_dx, w_zy, dw_dy,
    dw_dz) for this corner pair.  All fp32, shapes [chunk, ...]."""
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    z0 = jnp.floor(gz)
    tx = gx - x0
    ty = gy - y0
    tz = gz - z0

    zc = z0 + dz
    yc = y0 + dy
    valid_zy = ((zc >= 0) & (zc <= D - 1) & (yc >= 0) & (yc <= H - 1))
    zi = jnp.clip(zc, 0, D - 1).astype(jnp.int32)
    yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
    ridx = (nidx * D + zi) * H + yi

    seg = rows[ridx].reshape(-1, W, C).astype(jnp.float32)    # wide-row gather

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    x0i = x0.astype(jnp.int32)[:, None]
    w0 = jnp.where((iota == x0i) & (x0 >= 0)[:, None] & (x0 <= W - 1)[:, None],
                   1.0, 0.0)
    w1 = jnp.where((iota == x0i + 1) & ((x0 + 1) >= 0)[:, None]
                   & ((x0 + 1) <= W - 1)[:, None], 1.0, 0.0)
    w_x = (1.0 - tx)[:, None] * w0 + tx[:, None] * w1          # [chunk, W]
    wdx = w1 - w0                                              # d w_x / d tx

    val = jnp.einsum("pw,pwc->pc", w_x, seg)
    val_dx = jnp.einsum("pw,pwc->pc", wdx, seg)

    wz = (1.0 - tz) if dz == 0 else tz
    wy = (1.0 - ty) if dy == 0 else ty
    dwz = -1.0 if dz == 0 else 1.0
    dwy = -1.0 if dy == 0 else 1.0
    m = valid_zy.astype(jnp.float32)
    return val, val_dx, wz * wy * m, dwy * wz * m, dwz * wy * m, (ridx, w_x, seg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_3d_fast(x: jnp.ndarray, grid: jnp.ndarray,
                        grids_per_source: int = 1) -> jnp.ndarray:
    """Exact trilinear grid_sample (align_corners=True, zeros padding),
    wide-row-gather implementation.  x [N,D,H,W,C], grid [N*gps,Do,Ho,Wo,3]."""
    return _fwd(x, grid, grids_per_source)[0]


def _fwd(x, grid, grids_per_source=1):
    N, D, H, W, C = x.shape
    G = grid.shape[0]
    Do, Ho, Wo = grid.shape[1:4]
    rows = x.reshape(N * D * H, W * C)
    gx, gy, gz, nidx = _coords(x.shape, grid, grids_per_source)
    (cgx, cgy, cgz, cnidx), P = _pad_chunks([gx, gy, gz, nidx], _CHUNK)

    def body(args):
        gx, gy, gz, nidx = args
        acc = jnp.zeros((gx.shape[0], C), jnp.float32)
        for dz in (0, 1):
            for dy in (0, 1):
                val, _, wzy, _, _, _ = _corner_terms(rows, nidx, gx, gy, gz,
                                                     dz, dy, D, H, W, C)
                acc = acc + wzy[:, None] * val
        return acc

    out = jax.lax.map(body, (cgx, cgy, cgz, cnidx))
    out = out.reshape(-1, C)[:P].reshape(G, Do, Ho, Wo, C).astype(x.dtype)
    return out, (x, grid)


def _bwd(grids_per_source, res, g):
    x, grid = res
    N, D, H, W, C = x.shape
    Do, Ho, Wo = grid.shape[1:4]
    rows = x.reshape(N * D * H, W * C)
    gx, gy, gz, nidx = _coords(x.shape, grid, grids_per_source)
    gflat = g.reshape(-1, C).astype(jnp.float32)
    (cgx, cgy, cgz, cnidx, cg), P = _pad_chunks([gx, gy, gz, nidx, gflat], _CHUNK)

    drows0 = jnp.zeros((N * D * H, W * C), jnp.float32)

    def body(drows, args):
        gx, gy, gz, nidx, gout = args
        dgx = jnp.zeros_like(gx)
        dgy = jnp.zeros_like(gy)
        dgz = jnp.zeros_like(gz)
        for dz in (0, 1):
            for dy in (0, 1):
                val, val_dx, wzy, dwy, dwz, (ridx, w_x, _) = _corner_terms(
                    rows, nidx, gx, gy, gz, dz, dy, D, H, W, C)
                gdot = jnp.sum(gout * val, axis=-1)              # [chunk]
                dgx = dgx + wzy * jnp.sum(gout * val_dx, axis=-1)
                dgy = dgy + dwy * gdot
                dgz = dgz + dwz * gdot
                # dsource: rank-1 updates w_x (x) (wzy * gout)
                upd = (w_x[:, :, None] * (wzy[:, None] * gout)[:, None, :]
                       ).reshape(-1, W * C)
                drows = drows.at[ridx].add(upd)
        return drows, (dgx, dgy, dgz)

    drows, (dgx, dgy, dgz) = jax.lax.scan(body, drows0, (cgx, cgy, cgz, cnidx, cg))
    dx = drows.reshape(N, D, H, W, C).astype(x.dtype)
    # unnormalize scale: d gx / d grid_x = (W-1)/2  (align_corners=True)
    dgx = dgx.reshape(-1)[:P] * ((W - 1) * 0.5)
    dgy = dgy.reshape(-1)[:P] * ((H - 1) * 0.5)
    dgz = dgz.reshape(-1)[:P] * ((D - 1) * 0.5)
    dgrid = jnp.stack([dgx, dgy, dgz], axis=-1).reshape(grid.shape).astype(grid.dtype)
    return dx, dgrid


grid_sample_3d_fast.defvjp(
    lambda x, grid, gps: _fwd(x, grid, gps), _bwd)
