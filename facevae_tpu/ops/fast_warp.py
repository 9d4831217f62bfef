"""TPU-fast trilinear warp (exact grid_sample_3d semantics, align_corners=True,
zeros padding) built from wide-row gathers.

Why: XLA lowers per-voxel grid_sample gathers to an element-row path that runs
at ~2GB/s on TPU, and the gather's VJP to an even slower scatter (~1GB/s) —
together they were 85% of the training step.  Row-granularity gathers run at
50-270GB/s (measured; bandwidth scales with row width).  So:

  forward:  for each of the 4 (z,y) corner pairs, gather the full source
            x-line per output voxel — a fast wide-row gather — then reduce
            along x with a 2-nonzero weight vector on the VPU.  Chunked with
            lax.map so transients stay bounded.
  backward: custom VJP.  d/dsource is 4 wide-row scatter-adds of rank-1
            (w_x x dout) updates (~57GB/s); d/dgrid reuses the forward
            gathers (recomputed, not saved).

Layout: rows are C-MAJOR ([..., C, W] flattened) — the source volume is
transposed ONCE (MBs) so the per-voxel x-reduction is a contiguous lane-axis
sum and no gathered-GB transposes appear (profiled: the x-minor layout cost
>1GB of copies per step).

The output is tagged with checkpoint_name 'warp_out' so a remat policy can
save it instead of recomputing the warp in the backward pass.

Numerics identical to ops.grid_sample.grid_sample_3d (verified in tests);
accumulation in fp32.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

_CHUNK_BYTES = 64 << 20   # per-chunk gathered-rows transient budget


def _chunk_size(C, W):
    """Voxels per chunk so the [chunk, C*W] fp32 transients stay ~64MB."""
    return max(1 << 14, _CHUNK_BYTES // (C * W * 4))


def _coords(x_shape, grid, grids_per_source):
    """Unnormalize (align_corners=True); returns flat per-voxel coords + the
    SOURCE batch index per voxel (grid batch // grids_per_source — lets K+1
    warps of the same volume share one un-repeated source)."""
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


def _rows_cmajor(x):
    """[N,D,H,W,C] -> [(N*D*H), C*W] rows (one transpose of the whole source,
    so gathered rows reduce along contiguous x)."""
    N, D, H, W, C = x.shape
    return x.transpose(0, 1, 2, 4, 3).reshape(N * D * H, C * W)


def _corner_terms(rows, nidx, gx, gy, gz, dz, dy, D, H, W, C, need_seg=False):
    """Gather (z0+dz, y0+dy) rows; return (val, val_dx, w_zy, dw_y, dw_z,
    (ridx, w_x)).  val/val_dx: [chunk, C] fp32."""
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

    seg = rows[ridx].astype(jnp.float32)                       # [chunk, C*W] gather

    # weight vectors built directly in the flat C-major layout: index c*W+x
    P_, CW = seg.shape
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1) % W
    x0i = x0.astype(jnp.int32)[:, None]
    w0 = jnp.where((iota_x == x0i) & (x0 >= 0)[:, None] & (x0 <= W - 1)[:, None],
                   1.0, 0.0)
    w1 = jnp.where((iota_x == x0i + 1) & ((x0 + 1) >= 0)[:, None]
                   & ((x0 + 1) <= W - 1)[:, None], 1.0, 0.0)
    w_flat = (1.0 - tx)[:, None] * w0 + tx[:, None] * w1       # [chunk, C*W]
    wdx_flat = w1 - w0                                         # d w / d tx

    # flat elementwise products, then a contiguous lane-axis reduction per c
    val = (seg * w_flat).reshape(P_, C, W).sum(-1)             # [chunk, C]
    val_dx = (seg * wdx_flat).reshape(P_, C, W).sum(-1)

    wz = (1.0 - tz) if dz == 0 else tz
    wy = (1.0 - ty) if dy == 0 else ty
    dwz = -1.0 if dz == 0 else 1.0
    dwy = -1.0 if dy == 0 else 1.0
    m = valid_zy.astype(jnp.float32)
    return val, val_dx, wz * wy * m, dwy * wz * m, dwz * wy * m, (ridx, w_flat)


# ---------------------------------------------------------------------------
# MXU path (bf16): the (z,y) row lookup becomes a 4-nonzero one-hot matmul
# A[p, z*H+y] against the volume's row matrix [D*H, C*W].  Forward = one
# matmul per chunk; d/dsource = A^T @ upd (a transposed matmul — NO scatter);
# d/dgrid = two extra matmuls with derivative one-hots.  Weights in bf16 add
# ~0.4% relative error — on par with the bf16 activations this path serves.
# ---------------------------------------------------------------------------

_MM_CHUNK = 1 << 16


def _zy_onehots(gy, gz, D, H, need_grads):
    """Build the (z,y)-bilinear one-hot matrices: A [chunk, D*H] with up to 4
    nonzeros; optionally dA/dgy and dA/dgz."""
    y0 = jnp.floor(gy)
    z0 = jnp.floor(gz)
    ty = gy - y0
    tz = gz - z0
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, D * H), 1)
    A = 0.0
    Ay = 0.0
    Az = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            zc = z0 + dz
            yc = y0 + dy
            valid = ((zc >= 0) & (zc <= D - 1) & (yc >= 0) & (yc <= H - 1))
            r = (jnp.clip(zc, 0, D - 1).astype(jnp.int32) * H
                 + jnp.clip(yc, 0, H - 1).astype(jnp.int32))
            hit = (iota_r == r[:, None]) & valid[:, None]
            wz = (1.0 - tz) if dz == 0 else tz
            wy = (1.0 - ty) if dy == 0 else ty
            # built directly in bf16: halves the [chunk, D*H] transients so
            # chunks can be 2x larger (fewer while iterations)
            A = A + jnp.where(hit, (wz * wy)[:, None].astype(jnp.bfloat16), jnp.bfloat16(0))
            if need_grads:
                dwy = -1.0 if dy == 0 else 1.0
                dwz = -1.0 if dz == 0 else 1.0
                Ay = Ay + jnp.where(hit, (dwy * wz)[:, None].astype(jnp.bfloat16), jnp.bfloat16(0))
                Az = Az + jnp.where(hit, (dwz * wy)[:, None].astype(jnp.bfloat16), jnp.bfloat16(0))
    return A, Ay, Az


def _x_weights(gx, W, CW):
    x0 = jnp.floor(gx)
    tx = gx - x0
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1) % W
    x0i = x0.astype(jnp.int32)[:, None]
    w0 = jnp.where((iota_x == x0i) & (x0 >= 0)[:, None] & (x0 <= W - 1)[:, None],
                   1.0, 0.0)
    w1 = jnp.where((iota_x == x0i + 1) & ((x0 + 1) >= 0)[:, None]
                   & ((x0 + 1) <= W - 1)[:, None], 1.0, 0.0)
    w_flat = (1.0 - tx)[:, None] * w0 + tx[:, None] * w1
    wdx_flat = w1 - w0
    return w_flat, wdx_flat


def _mm_prepare(x, grid, grids_per_source):
    """Common reshapes for the matmul path: per-source row matrices and
    n-pure voxel chunks."""
    N, D, H, W, C = x.shape
    G = grid.shape[0]
    Pn = grids_per_source * grid.shape[1] * grid.shape[2] * grid.shape[3]
    rows3 = x.transpose(0, 1, 2, 4, 3).reshape(N, D * H, C * W).astype(jnp.bfloat16)
    gx, gy, gz, _ = _coords(x.shape, grid, grids_per_source)
    # voxel order is n-major: reshape to [N, Pn] then chunk each n
    chunk = min(_MM_CHUNK, Pn)
    assert Pn % chunk == 0, (Pn, chunk)
    cpn = Pn // chunk
    def split(a):
        return a.reshape(N * cpn, chunk)
    nid = jax.lax.broadcasted_iota(jnp.int32, (N * cpn, 1), 0) // cpn
    return rows3, split(gx), split(gy), split(gz), nid[:, 0], (N, D, H, W, C, cpn)


def _fwd_mm(x, grid, grids_per_source):
    rows3, cgx, cgy, cgz, cnid, meta = _mm_prepare(x, grid, grids_per_source)
    N, D, H, W, C, cpn = meta
    G = grid.shape[0]
    Do, Ho, Wo = grid.shape[1:4]
    CW = C * W

    def body(args):
        gx, gy, gz, n = args
        A, _, _ = _zy_onehots(gy, gz, D, H, need_grads=False)
        rows_n = jax.lax.dynamic_index_in_dim(rows3, n, 0, keepdims=False)
        S = jnp.dot(A, rows_n, preferred_element_type=jnp.float32)   # [chunk, CW]
        w_flat, _ = _x_weights(gx, W, CW)
        return (S * w_flat).reshape(-1, C, W).sum(-1)            # [chunk, C]

    out = jax.lax.map(body, (cgx, cgy, cgz, cnid))
    out = out.reshape(G, Do, Ho, Wo, C).astype(x.dtype)
    out = checkpoint_name(out, "warp_out")
    return out, (x, grid)


def _bwd_mm(grids_per_source, res, g):
    x, grid = res
    rows3, cgx, cgy, cgz, cnid, meta = _mm_prepare(x, grid, grids_per_source)
    N, D, H, W, C, cpn = meta
    CW = C * W
    gflat = g.reshape(-1, C).astype(jnp.float32).reshape(cgx.shape[0], -1, C)

    drows0 = jnp.zeros((N, D * H, CW), jnp.float32)

    def body(drows, args):
        gx, gy, gz, n, gout = args
        A, Ay, Az = _zy_onehots(gy, gz, D, H, need_grads=True)
        rows_n = jax.lax.dynamic_index_in_dim(rows3, n, 0, keepdims=False)
        A16 = A
        S = jnp.dot(A16, rows_n, preferred_element_type=jnp.float32)
        Sy = jnp.dot(Ay, rows_n, preferred_element_type=jnp.float32)
        Sz = jnp.dot(Az, rows_n, preferred_element_type=jnp.float32)
        w_flat, wdx_flat = _x_weights(gx, W, CW)

        gout_rep = jnp.repeat(gout, W, axis=1)                   # [chunk, CW]
        upd = gout_rep * w_flat
        dgx = jnp.sum((S * wdx_flat).reshape(-1, C, W).sum(-1) * gout, axis=-1)
        dgy = jnp.sum((Sy * w_flat).reshape(-1, C, W).sum(-1) * gout, axis=-1)
        dgz = jnp.sum((Sz * w_flat).reshape(-1, C, W).sum(-1) * gout, axis=-1)
        dn = jnp.dot(A16.T, upd.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)         # [D*H, CW]
        drows = drows.at[n].add(dn)
        return drows, (dgx, dgy, dgz)

    drows, (dgx, dgy, dgz) = jax.lax.scan(body, drows0, (cgx, cgy, cgz, cnid, gflat))
    dx = drows.reshape(N, D, H, C, W).transpose(0, 1, 2, 4, 3).astype(x.dtype)
    P = grid.shape[0] * grid.shape[1] * grid.shape[2] * grid.shape[3]
    dgx = dgx.reshape(-1)[:P] * ((W - 1) * 0.5)
    dgy = dgy.reshape(-1)[:P] * ((H - 1) * 0.5)
    dgz = dgz.reshape(-1)[:P] * ((D - 1) * 0.5)
    dgrid = jnp.stack([dgx, dgy, dgz], axis=-1).reshape(grid.shape).astype(grid.dtype)
    return dx, dgrid


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_3d_fast(x: jnp.ndarray, grid: jnp.ndarray,
                        grids_per_source: int = 1) -> jnp.ndarray:
    """Trilinear grid_sample (align_corners=True, zeros padding).

    fp32 inputs: exact wide-row-gather path.  bf16 inputs: MXU one-hot-matmul
    path (gather/scatter-free; weights rounded to bf16).
    x [N,D,H,W,C], grid [N*gps,Do,Ho,Wo,3].
    """
    return _dispatch_fwd(x, grid, grids_per_source)[0]


def _mm_ok(x, grid, grids_per_source):
    Pn = grids_per_source * grid.shape[1] * grid.shape[2] * grid.shape[3]
    return x.dtype == jnp.bfloat16 and Pn % min(_MM_CHUNK, Pn) == 0


def _dispatch_fwd(x, grid, grids_per_source=1):
    if _mm_ok(x, grid, grids_per_source):
        return _fwd_mm(x, grid, grids_per_source)
    return _fwd(x, grid, grids_per_source)


def _dispatch_bwd(grids_per_source, res, g):
    x, grid = res
    if _mm_ok(x, grid, grids_per_source):
        return _bwd_mm(grids_per_source, res, g)
    return _bwd(grids_per_source, res, g)


def _fwd(x, grid, grids_per_source=1):
    N, D, H, W, C = x.shape
    G = grid.shape[0]
    Do, Ho, Wo = grid.shape[1:4]
    rows = _rows_cmajor(x)
    gx, gy, gz, nidx = _coords(x.shape, grid, grids_per_source)
    (cgx, cgy, cgz, cnidx), P = _pad_chunks([gx, gy, gz, nidx], _chunk_size(C, W))

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
    out = checkpoint_name(out, "warp_out")
    return out, (x, grid)


def _bwd(grids_per_source, res, g):
    x, grid = res
    N, D, H, W, C = x.shape
    Do, Ho, Wo = grid.shape[1:4]
    rows = _rows_cmajor(x)
    gx, gy, gz, nidx = _coords(x.shape, grid, grids_per_source)
    gflat = g.reshape(-1, C).astype(jnp.float32)
    (cgx, cgy, cgz, cnidx, cg), P = _pad_chunks([gx, gy, gz, nidx, gflat], _chunk_size(C, W))

    drows0 = jnp.zeros((N * D * H, C * W), jnp.float32)

    def body(drows, args):
        gx, gy, gz, nidx, gout = args
        dgx = jnp.zeros_like(gx)
        dgy = jnp.zeros_like(gy)
        dgz = jnp.zeros_like(gz)
        for dz in (0, 1):
            for dy in (0, 1):
                val, val_dx, wzy, dwy, dwz, (ridx, w_flat) = _corner_terms(
                    rows, nidx, gx, gy, gz, dz, dy, D, H, W, C)
                gdot = jnp.sum(gout * val, axis=-1)              # [chunk]
                dgx = dgx + wzy * jnp.sum(gout * val_dx, axis=-1)
                dgy = dgy + dwy * gdot
                dgz = dgz + dwz * gdot
                # dsource updates built in the flat layout (no 3D transposes):
                # upd[p, c*W+x] = wzy*gout[p,c] * w[p,x]
                a = jnp.repeat(wzy[:, None] * gout, W, axis=1)   # [chunk, C*W]
                upd = a * w_flat
                drows = drows.at[ridx].add(upd)
        return drows, (dgx, dgy, dgz)

    drows, (dgx, dgy, dgz) = jax.lax.scan(body, drows0, (cgx, cgy, cgz, cnidx, cg))
    dx = (drows.reshape(N, D, H, C, W).transpose(0, 1, 2, 4, 3)).astype(x.dtype)
    # unnormalize scale: d gx / d grid_x = (W-1)/2  (align_corners=True)
    dgx = dgx.reshape(-1)[:P] * ((W - 1) * 0.5)
    dgy = dgy.reshape(-1)[:P] * ((H - 1) * 0.5)
    dgz = dgz.reshape(-1)[:P] * ((D - 1) * 0.5)
    dgrid = jnp.stack([dgx, dgy, dgz], axis=-1).reshape(grid.shape).astype(grid.dtype)
    return dx, dgrid


grid_sample_3d_fast.defvjp(
    lambda x, grid, gps: _dispatch_fwd(x, grid, gps), _dispatch_bwd)
