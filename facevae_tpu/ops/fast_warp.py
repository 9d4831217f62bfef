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

    # weight vectors in the flat C-major layout (built at width W, tiled to CW)
    P_, CW = seg.shape
    w_flat, wdx_flat = _x_weights(gx, W, CW)                   # [chunk, C*W]

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


def _axis_onehot(g, n, need_grad=True):
    """1D linear-interp one-hot [chunk, n] (2 nonzeros, OOB masked) and its
    derivative d/dg [chunk, n].

    The tent formulation w_j = max(0, 1-|j-g|) IS linear interpolation with
    zeros padding: in-bounds corners get (1-t, t), out-of-range corners simply
    have no j — ~3x fewer VPU ops than the floor/compare/mask construction
    and bit-identical where t = g-floor(g) is exact.  dw picks the torch
    subgradient at integer g (corner j: -1 on (j, j+1], +1 on [j-1, j))."""
    iota = jax.lax.broadcasted_iota(jnp.float32, (1, n), 1)
    d = iota - g[:, None]                                  # [chunk, n]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    dw = None
    if need_grad:
        dw = (jnp.where(d > 0, 1.0, -1.0)
              * ((d > -1) & (d <= 1)).astype(jnp.float32))
    return w, dw


def _zy_onehots(gy, gz, D, H, need_grads):
    """Build the (z,y)-bilinear one-hot matrices: A [chunk, D*H] with up to 4
    nonzeros; optionally dA/dgy and dA/dgz.

    The bilinear weights (incl. validity masks) factor exactly over z and y,
    so A = Az ⊗ Ay is ONE outer-product pass over [chunk, D*H] instead of 4
    full-width corner passes — the A build was the VPU hot spot of the warp
    (the [chunk, D*H] transients dominate the one-hot-matmul fusions)."""
    P = gy.shape[0]
    wz, dwz = _axis_onehot(gz, D, need_grads)         # [chunk, D]
    wy, dwy = _axis_onehot(gy, H, need_grads)         # [chunk, H]

    def outer(a, b):
        # fp32 product, bf16 result: same rounding as the old (wz*wy)->bf16
        return (a[:, :, None] * b[:, None, :]).astype(jnp.bfloat16).reshape(P, D * H)

    A = outer(wz, wy)
    Ay = Az = 0.0
    if need_grads:
        Ay = outer(wz, dwy)
        Az = outer(dwz, wy)
    return A, Ay, Az


def _x_weights(gx, W, CW, need_grad=True):
    """x-interp weights in the flat C-major layout (index c*W+x): built at
    width W, then tiled across the C channel blocks (the flat pattern repeats
    every W entries — a broadcast, not CW-wide compares)."""
    P = gx.shape[0]
    C = CW // W
    wx, dwx = _axis_onehot(gx, W, need_grad)          # [chunk, W]
    w_flat = jnp.broadcast_to(wx[:, None, :], (P, C, W)).reshape(P, CW)
    wdx_flat = None
    if need_grad:
        wdx_flat = jnp.broadcast_to(dwx[:, None, :], (P, C, W)).reshape(P, CW)
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
        w_flat, _ = _x_weights(gx, W, CW, need_grad=False)
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


_PALLAS_VMEM_BUDGET = 14 << 20     # per-kernel scoped-vmem budget (of 16MB)


def _pallas_plan(x, grid, grids_per_source):
    """Voxel-block sizes for the fused Pallas kernels, or None where the
    shapes don't fit (falls back to XLA per function: a missing 'dgrid' or
    'drows' only disables the Pallas BACKWARD).

    Per-VB VMEM coefficients are calibrated against Mosaic's measured scoped
    allocations (the fp32 axis-weight intermediates of _build_A dominate, not
    just the A/S blocks): at the MFE shape (DH=1024, CW=256) the dgrid kernel
    measured 19.4MB at VB=1024 and fits at VB=512.  Each VB must divide the
    per-source voxel count so blocks never straddle sources."""
    N, D, H, W, C = x.shape
    DH, CW = D * H, C * W
    Pn = grids_per_source * grid.shape[1] * grid.shape[2] * grid.shape[3]
    if (x.dtype != jnp.bfloat16 or jax.default_backend() != "tpu"
            or DH % 128 != 0 or CW % 128 != 0):
        return None

    def pick(per_vb, fixed):
        for vb in (1024, 512, 256, 128):
            if Pn % vb == 0 and fixed + vb * per_vb <= _PALLAS_VMEM_BUDGET:
                return vb
        return None

    rows_b = DH * CW * 2
    plan = {
        # fwd: tent weights fuse into the A assembly; A bf16 on DH, S f32 +
        # wx f32 + Swx bf16 on CW (VB=1024 verified at the MFE shape)
        "fwd": pick(DH * 6 + CW * 10, 2 * rows_b),
        # dgrid: 4 axis f32 + 3 A bf16 on DH; 3 S + wx/dwx + gout_rep + temps
        # (19.4MB measured at VB=1024/MFE -> VB=512 there)
        "dgrid": pick(DH * 16 + CW * 24, 2 * rows_b),
        # drows: like fwd plus the revisited f32 output block
        "drows": pick(DH * 6 + CW * 10, DH * CW * 4),
    }
    if plan["fwd"] is None:
        return None
    return plan


def _pallas_ok(x, grid, grids_per_source):
    """Fused implicit-A Pallas kernels (ops/pallas/warp_mm.py): DEFAULT for
    the bf16 path on a real TPU when shapes fit (blocks don't straddle
    sources, VMEM budget).  Full-step A/B: 9.69 vs 8.41 frames/s over the XLA
    one-hot-matmul path — the kernels never materialize the [P, D*H] one-hot
    operands to HBM (the XLA path's dominant traffic), and the backward is
    split into a dgrid kernel and a rows-free drows kernel with independent
    voxel-block sizes.  FACEVAE_NO_PALLAS_WARP=1 falls back to XLA (A/B,
    debugging); see PERF.md."""
    import os
    if os.environ.get("FACEVAE_NO_PALLAS_WARP"):
        return False
    return _pallas_plan(x, grid, grids_per_source) is not None


def _rows3(x):
    """[N,D,H,W,C] -> C-major row matrices [N, D*H, C*W] bf16."""
    N, D, H, W, C = x.shape
    return x.transpose(0, 1, 2, 4, 3).reshape(N, D * H, C * W).astype(jnp.bfloat16)


def _pallas_prepare(x, grid, grids_per_source):
    N, D, H, W, C = x.shape
    gx, gy, gz, _ = _coords(x.shape, grid, grids_per_source)
    return _rows3(x), gx, gy, gz, (N, D, H, W, C)


def _fwd_pallas(x, grid, grids_per_source):
    from facevae_tpu.ops.pallas.warp_mm import warp_mm_fwd_pallas
    rows3, gx, gy, gz, (N, D, H, W, C) = _pallas_prepare(x, grid, grids_per_source)
    G = grid.shape[0]
    Do, Ho, Wo = grid.shape[1:4]
    plan = _pallas_plan(x, grid, grids_per_source)
    out = warp_mm_fwd_pallas(rows3, gx, gy, gz, D=D, H=H, W=W, C=C,
                             VB=plan["fwd"])                    # [C, P]
    out = out.T.reshape(G, Do, Ho, Wo, C).astype(x.dtype)
    out = checkpoint_name(out, "warp_out")
    return out, (x, grid)


def _bwd_pallas(grids_per_source, res, g):
    from facevae_tpu.ops.pallas.warp_mm import warp_mm_bwd_pallas
    x, grid = res
    rows3, gx, gy, gz, (N, D, H, W, C) = _pallas_prepare(x, grid, grids_per_source)
    P = gx.shape[0]
    goutT = g.reshape(P, C).T.astype(jnp.float32)   # [C, P]: voxels on lanes
    plan = _pallas_plan(x, grid, grids_per_source)
    drows, dgx, dgy, dgz = warp_mm_bwd_pallas(rows3, gx, gy, gz, goutT,
                                              D=D, H=H, W=W, C=C,
                                              VB_DGRID=plan["dgrid"],
                                              VB_DROWS=plan["drows"])
    dx = drows.reshape(N, D, H, C, W).transpose(0, 1, 2, 4, 3).astype(x.dtype)
    dgx = dgx * ((W - 1) * 0.5)
    dgy = dgy * ((H - 1) * 0.5)
    dgz = dgz * ((D - 1) * 0.5)
    dgrid = jnp.stack([dgx, dgy, dgz], axis=-1).reshape(grid.shape).astype(grid.dtype)
    return dx, dgrid


def _dispatch_fwd(x, grid, grids_per_source=1):
    if _pallas_ok(x, grid, grids_per_source):
        return _fwd_pallas(x, grid, grids_per_source)
    if _mm_ok(x, grid, grids_per_source):
        return _fwd_mm(x, grid, grids_per_source)
    return _fwd(x, grid, grids_per_source)


# ---------------------------------------------------------------------------
# fused multi-grid warp: one source volume, K1 grids, k-major fused channels
# ---------------------------------------------------------------------------


def _multi_coords(x, grids):
    N, D, H, W, C = x.shape
    K1 = grids.shape[1]
    NV = grids.shape[2] * grids.shape[3] * grids.shape[4]
    gx, gy, gz, _ = _coords(x.shape, grids.reshape(N * K1, *grids.shape[2:]), K1)
    shape = (N, K1, NV)
    return gx.reshape(shape), gy.reshape(shape), gz.reshape(shape), NV


def _multi_plan(x, K1, NV):
    """Block plan for the (K1 x G)-looped kernels.  Channel GROUPING: when
    C*W exceeds the per-group budget, the volume splits into G contiguous
    Cg-channel groups sharing each block's one-hot A matrices — this is how
    the generator's C=32 warp (C*W=2048) fits VMEM.  The fused IO adds the
    [VB, K1*C] f32 out/gout block to each budget."""
    import os
    if os.environ.get("FACEVAE_NO_PALLAS_WARP"):
        return None
    N, D, H, W, C = x.shape
    DH = D * H
    # no K1*C alignment needed: the fused out/gout blocks span the full
    # channel dim (Mosaic allows block dims equal to the array dim)
    if (x.dtype != jnp.bfloat16 or jax.default_backend() != "tpu"
            or DH % 128 != 0):
        return None

    def pick(per_vb, fixed, env=None):
        # experiment overrides (bench A/B only) are gated on the generator's
        # C==32 shape — a global override would leak into the MFE/TPS plans,
        # whose NV differs — and must divide NV: grid=(N, G, NV//VB) silently
        # drops trailing voxels otherwise.
        ov = os.environ.get(env) if env and C == 32 else None
        if ov:
            vb = int(ov)
            if NV % vb != 0:
                raise ValueError(
                    f"{env}={vb} does not divide NV={NV}; the kernel grid "
                    "would drop trailing voxels")
            return vb
        for vb in (1024, 512, 256, 128):
            if NV % vb == 0 and fixed + vb * per_vb <= _PALLAS_VMEM_BUDGET:
                return vb
        return None

    # Z-BANDING (ops/pallas/warp_mm.py): fitting blocks contract a zb*H row
    # band instead of the full D*H — a D/zb FLOP cut at bit-identical output
    # (measured 1.66x on the MFE fwd shape, tools/proto_banded_warp.py).
    # Requires D > zb so the band is a strict slice; FACEVAE_ZB overrides
    # (0 disables — A/B knob).
    zb = int(os.environ.get("FACEVAE_ZB", "8"))
    zb = zb if (zb > 0 and D > zb) else None

    fused = K1 * C * 4                  # the fwd [VB, K1*C] f32 out block
    rows_b = DH * C * W * 2             # whole-volume rows (fwd reads all G)
    # experiment knob (bench A/B): force the channel grouping for the C=32
    # (generator) shape only — a global override would break the C=4 MFE plan
    g_env = os.environ.get("FACEVAE_MULTI_G") if C == 32 else None
    for G in ((int(g_env),) if g_env else (1, 2, 4, 8, 16)):
        if C % G:
            continue
        CWg = (C // G) * W
        if CWg % 128 != 0:
            continue
        # k-looped kernels measure ~2x the single-k per-VB transients (Mosaic
        # overlaps loop iterations): fwd 22.3MB at VB=1024/MFE -> VB=512 fits.
        # The backward kernels run a (N, G, bpz) grid: their rows/gout/out
        # blocks cover ONE channel group (double-buffered by Mosaic), so
        # larger G shrinks their fixed cost instead of growing the stack.
        fused_g = K1 * (C // G) * 4     # the bwd [VB, K1*Cg] f32 gout block
        rows_g = DH * CWg * 2
        plan = {
            "G": G, "zb": zb,
            "fwd": pick(DH * 14 + CWg * 20 + fused, 2 * rows_b,
                        env="FACEVAE_VB_FWD"),
            "dgrid": pick(DH * 22 + CWg * 30 + fused_g, 2 * rows_g,
                          env="FACEVAE_VB_DGRID"),
            "drows": pick(DH * 14 + CWg * 20 + fused_g, 2 * DH * CWg * 4,
                          env="FACEVAE_VB_DROWS"),
        }
        if plan["fwd"] is not None and plan["dgrid"] is not None \
                and plan["drows"] is not None:
            return plan
    # fall back to forward-only at the coarsest grouping that fits
    for G in (1, 2, 4, 8, 16):
        if C % G or ((C // G) * W) % 128 != 0:
            continue
        CWg = (C // G) * W
        plan = {"G": G, "zb": zb,
                "fwd": pick(DH * 14 + CWg * 20 + fused, 2 * rows_b),
                "dgrid": None, "drows": None}
        if plan["fwd"] is not None:
            return plan
    return None


def _multi_fallback_fwd(x, grids, K1):
    """Fallback path: per-(n,k) warp (via the public custom-VJP op, so this
    stays differentiable when called directly) + transpose into the fused
    layout."""
    N, D, H, W, C = x.shape
    Do, Ho, Wo = grids.shape[2:5]
    out = grid_sample_3d_fast(x, grids.reshape(N * K1, Do, Ho, Wo, 3), K1)
    out = out.reshape(N, K1, Do, Ho, Wo, C).transpose(0, 2, 3, 4, 1, 5)
    return out.reshape(N, Do, Ho, Wo, K1 * C)


def _grids_from_pixel_coords(x_shape, cgx, cgy, cgz, spatial):
    """Rebuild normalized [-1,1] grids [N,K1,Do,Ho,Wo,3] for the fallback."""
    N, D, H, W, C = x_shape
    K1 = cgx.shape[1]
    Do, Ho, Wo = spatial
    gn = jnp.stack([cgx * (2.0 / (W - 1)) - 1.0,
                    cgy * (2.0 / (H - 1)) - 1.0,
                    cgz * (2.0 / (D - 1)) - 1.0], axis=-1)
    return gn.reshape(N, K1, Do, Ho, Wo, 3)


def _rows4(x, G):
    """[N,D,H,W,C] -> G contiguous channel groups of C-major rows
    [N, G, D*H, (C/G)*W] bf16."""
    N, D, H, W, C = x.shape
    Cg = C // G
    r = x.reshape(N, D, H, W, G, Cg).transpose(0, 4, 1, 2, 5, 3)
    return r.reshape(N, G, D * H, Cg * W).astype(jnp.bfloat16)


def _multi_px_fwd(x, cgx, cgy, cgz, spatial):
    N, D, H, W, C = x.shape
    K1, NV = cgx.shape[1], cgx.shape[2]
    Do, Ho, Wo = spatial
    plan = _multi_plan(x, K1, NV)
    if plan is None:
        grids = _grids_from_pixel_coords(x.shape, cgx, cgy, cgz, spatial)
        return _multi_fallback_fwd(x, grids, K1), (x, cgx, cgy, cgz)
    from facevae_tpu.ops.pallas.warp_mm import warp_mm_fwd_multi_pallas
    G = plan["G"]
    out = warp_mm_fwd_multi_pallas(_rows4(x, G), cgx, cgy, cgz, D=D, H=H, W=W,
                                   Cg=C // G, K1=K1, G=G, VB=plan["fwd"],
                                   zb=plan["zb"])
    out = out.reshape(N, Do, Ho, Wo, K1 * C).astype(x.dtype)
    out = checkpoint_name(out, "warp_out")
    return out, (x, cgx, cgy, cgz)


def _multi_px_bwd(spatial, res, g):
    x, cgx, cgy, cgz = res
    N, D, H, W, C = x.shape
    K1, NV = cgx.shape[1], cgx.shape[2]
    Do, Ho, Wo = spatial
    plan = _multi_plan(x, K1, NV)
    if (plan is None or plan["dgrid"] is None or plan["drows"] is None):
        # per-(n,k) backward; its dgrid cotangent is in NORMALIZED units ->
        # convert back to pixel-coordinate cotangents
        grids = _grids_from_pixel_coords(x.shape, cgx, cgy, cgz, spatial)
        gk = g.reshape(N, Do, Ho, Wo, K1, C).transpose(0, 4, 1, 2, 3, 5)
        dx, dgrid = _dispatch_bwd(
            K1, (x, grids.reshape(N * K1, Do, Ho, Wo, 3)),
            gk.reshape(N * K1, Do, Ho, Wo, C))
        dgrid = dgrid.reshape(N, K1, NV, 3)
        return (dx, dgrid[..., 0] * (2.0 / (W - 1)),
                dgrid[..., 1] * (2.0 / (H - 1)),
                dgrid[..., 2] * (2.0 / (D - 1)))
    from facevae_tpu.ops.pallas.warp_mm import warp_mm_bwd_multi_pallas
    G = plan["G"]
    Cg = C // G
    gout = g.reshape(N, NV, K1 * C).astype(jnp.float32)
    drows, dgx, dgy, dgz = warp_mm_bwd_multi_pallas(
        _rows4(x, G), cgx, cgy, cgz, gout, D=D, H=H, W=W, Cg=Cg, K1=K1, G=G,
        VB_DGRID=plan["dgrid"], VB_DROWS=plan["drows"], zb=plan["zb"])
    dx = drows.reshape(N, G, D, H, Cg, W).transpose(0, 2, 3, 5, 1, 4)
    dx = dx.reshape(N, D, H, W, C).astype(x.dtype)
    return dx, dgx, dgy, dgz


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def warp_multi_pixel(x: jnp.ndarray, cgx: jnp.ndarray, cgy: jnp.ndarray,
                     cgz: jnp.ndarray, spatial) -> jnp.ndarray:
    """Fused multi-grid warp with PIXEL-space coordinate planes.

    x [N,D,H,W,C]; cgx/cgy/cgz [N,K1,NV] pixel coords (x in [0,W-1] etc.,
    align_corners=True semantics); spatial = (Do,Ho,Wo) with NV = Do*Ho*Wo.
    Returns [N,Do,Ho,Wo,K1*C] (k-major fused channels).

    Taking coordinate PLANES instead of a packed [...,3] grid keeps every HBM
    array's minor dim wide (a trailing dim of 3 is tile-padded 42x), and the
    VJP emits the same planes — the K1 motion fields can be constructed
    analytically from keypoints without ever materializing [N,K1,D,H,W,3]
    (ops/motion.sparse_motion_pixel_coords)."""
    return _multi_px_fwd(x, cgx, cgy, cgz, spatial)[0]


warp_multi_pixel.defvjp(
    lambda x, cgx, cgy, cgz, spatial: _multi_px_fwd(x, cgx, cgy, cgz, spatial),
    _multi_px_bwd)


def warp_single(x: jnp.ndarray, deformation: jnp.ndarray) -> jnp.ndarray:
    """One-grid warp of x [N,D,H,W,C] by a normalized [-1,1] grid
    [N,Do,Ho,Wo,3] -> [N,Do,Ho,Wo,C].

    Dispatch: the grouped Pallas multi path (pixel coordinate planes) when its
    plan fits; otherwise grid_sample_3d_fast DIRECTLY on the normalized grid —
    the fp32/fallback case never round-trips through pixel coordinates, so it
    stays bit-exact vs torch grid_sample (the pixel round trip adds ~1 ulp
    coordinate noise)."""
    N, D, H, W, C = x.shape
    spatial = deformation.shape[1:4]
    NV = spatial[0] * spatial[1] * spatial[2]
    if _multi_plan(x, 1, NV) is None:
        return grid_sample_3d_fast(x, deformation, 1)
    dflat = deformation.astype(jnp.float32).reshape(N, 1, NV, 3)
    return warp_multi_pixel(x,
                            (dflat[..., 0] + 1.0) * ((W - 1) * 0.5),
                            (dflat[..., 1] + 1.0) * ((H - 1) * 0.5),
                            (dflat[..., 2] + 1.0) * ((D - 1) * 0.5),
                            spatial)


def grid_sample_3d_multi(x: jnp.ndarray, grids: jnp.ndarray,
                         K1: int) -> jnp.ndarray:
    """Warp ONE source volume by K1 grids, emitting the fused k-major layout.

    x [N,D,H,W,C]; grids [N,K1,Do,Ho,Wo,3] -> [N,Do,Ho,Wo,K1*C] where channel
    k*C+c is grid k's warp of channel c — exactly the packing MFE's conv input
    uses (models/mfe.py).  Thin differentiable wrapper over warp_multi_pixel;
    callers that can produce coordinate planes directly should (grids' [...,3]
    layout is tile-hostile)."""
    N = x.shape[0]
    spatial = grids.shape[2:5]
    cgx, cgy, cgz, NV = _multi_coords(x, grids)
    return warp_multi_pixel(x, cgx, cgy, cgz, spatial)


def _bwd_pallas_ok(x, grid, grids_per_source):
    import os
    if os.environ.get("FACEVAE_NO_PALLAS_WARP"):
        return False
    plan = _pallas_plan(x, grid, grids_per_source)
    return plan is not None and plan["dgrid"] is not None \
        and plan["drows"] is not None


def _dispatch_bwd(grids_per_source, res, g):
    x, grid = res
    if _bwd_pallas_ok(x, grid, grids_per_source):
        return _bwd_pallas(grids_per_source, res, g)
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
