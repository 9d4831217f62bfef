"""Fused trilinear-warp matmul kernels (Pallas / Mosaic).

The bf16 warp path expresses the (z,y)-corner lookup as a one-hot matmul
A[vox, D*H] @ rows[D*H, C*W] (see ops/fast_warp.py).  In XLA the A operand
must materialize in HBM — ~2KB/voxel of pure zeros traffic that dominates the
warp cost (profiled: ~0.34ms of each ~0.52ms warp fusion is A bytes).  Here A
(and in backward Ay/Az and the scatter one-hot A^T) are built INSIDE the
kernel in VMEM and fed straight to the MXU; HBM sees only coords in and
values out (~30B/voxel).

Numerics are CLOSE but not bit-identical to the XLA formulation: these
kernels round the x-weighted products (S*wx, gout_rep*wx / gout_rep*dwx) to
bf16 before their MXU contractions, whereas the XLA path (_fwd_mm/_bwd_mm)
keeps those products and the W-axis reduction in fp32.  The agreement is
guarded by the 2-3% tolerances in tools/check_pallas_warp.py, on par with the
bf16 activation noise this path serves.  The XLA path remains the fallback
for CPU tests / odd shapes and is the reference in tests/test_fast_warp.py.

Layout contract (matches fast_warp._mm_prepare):
  rows3 [N, D*H, C*W] bf16  — C-major rows (index c*W + x)
  coords gx/gy/gz [NB, VB] f32, n-major voxel order (source n = block//bps)
  fwd out [NB*VB, C] f32; bwd outs dgx/dgy/dgz [NB, VB] + drows [N, D*H, C*W]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_weights(g, n, iota_axis, need_grad=True):
    """Per-voxel 2-tap weights along one axis, spread over a [VB, L] iota map.

    g [VB] fractional coords; iota_axis [1, L] holds this axis' index at every
    flat position.  Returns (w, dw): [VB, L] fp32.

    Tent formulation (see ops/fast_warp._axis_onehot): w = max(0, 1-|j-g|) IS
    zeros-padded linear interpolation, at ~3x fewer VPU ops than the
    floor/compare/mask build; dw keeps the torch subgradient at integer g.
    """
    d = iota_axis.astype(jnp.float32) - g[:, None]          # [VB, L]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    dw = None
    if need_grad:
        dw = (jnp.where(d > 0, 1.0, -1.0)
              * ((d > -1) & (d <= 1)).astype(jnp.float32))
    return w, dw


def _build_A(gy, gz, D, H, need_grads):
    """A [VB, D*H] bf16 (+ dA/dgy, dA/dgz) built entirely in registers/VMEM."""
    DH = D * H
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, DH), 1)
    wz, dwz = _axis_weights(gz, D, iota // H, need_grads)
    wy, dwy = _axis_weights(gy, H, iota % H, need_grads)
    A = (wz * wy).astype(jnp.bfloat16)
    if not need_grads:
        return A, None, None
    return A, (wz * dwy).astype(jnp.bfloat16), (dwz * wy).astype(jnp.bfloat16)


def _x_weights(gx, W, CW, need_grad=True):
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1) % W
    return _axis_weights(gx, W, iota_x, need_grad)


def _seg_matrix(C, W):
    """Constant [C*W, C] block indicator: segment-sum over x via the MXU."""
    m = np.zeros((C * W, C), np.float32)
    for c in range(C):
        m[c * W:(c + 1) * W, c] = 1.0
    return jnp.asarray(m, jnp.bfloat16)


# ---------------------------------------------------------------------------
# k-looped "multi" kernels: the MFE hot path
#
# The training step warps ONE source volume by K+1 motion grids and consumes
# the results interleaved into channels ([N,D,H,W,(K+1)*C], k-major — see
# models/mfe.py).  Warping each (n,k) independently forces [P, C<8]-shaped
# HBM arrays at the op boundary, which the T(8,128) tiling pads 128/C-fold
# and which cost ~170ms/step in boundary transposes.  These kernels loop k
# INSIDE one voxel block instead: coords arrive [N, K1, NV] (clean NV lanes),
# the output/cotangent IS the fused [N, NV, K1*C] tensor the model uses, and
# no transposes exist at the boundary.
#
# Z-BANDING (zb != None): the one-hot contraction's D*H width is ~250x the
# useful taps, but a block of consecutive output voxels is z-COHERENT — its
# sampled z spans a narrow band for realistic motions (the voxel axis is
# (d,h,w)-ordered, so a block is a few y-rows of one output d-plane).  Per
# block, when every k's clipped z-range fits zb values, the kernels contract
# A_band [VB, zb*H] against a DYNAMIC sublane slice of the VMEM-resident rows
# (scalar-start pl.ds — supported by Mosaic, unlike the per-lane gathers
# PERF.md measured dead), at a D/zb FLOP cut; otherwise ONE block-level
# pl.when takes the full-width loop.  Outputs are BIT-IDENTICAL either way:
# the band only drops exact-zero addends from an fp32 accumulation, and the
# tent weights are built from the same absolute z indices.  Measured
# (tools/proto_banded_warp.py, MFE fwd shape): 28.6 -> 17.3 ms at fit rate
# 1.0; 28.7 ms (parity) at fit rate 0.  The fits test uses CLIPPED coords, so
# far-out-of-volume samples (all-zero taps) never force the full path.
# ---------------------------------------------------------------------------


def _z_band(gz_k, D, zb):
    """Per-block band starts z0 [K1] + a single all-k fits flag.

    gz_k [K1, VB] fp32 pixel-space z coords.  Nonzero tent taps of a voxel
    lie in {floor(zc), floor(zc)+1} of its CLIPPED coord, so a band covering
    [min floor, max floor + 1] is exact; it fits iff max-min <= zb - 2."""
    zc = jnp.clip(gz_k, 0.0, D - 1.0)
    lo = jnp.floor(jnp.min(zc, axis=1)).astype(jnp.int32)       # [K1]
    hi = jnp.floor(jnp.max(zc, axis=1)).astype(jnp.int32)
    fits = jnp.max(hi - lo) <= (zb - 2)
    return jnp.minimum(lo, D - zb), fits


def _band_A(gy, gz, z0, H, zb, need_grads):
    """A (+dA/dgy, dA/dgz) over the zb*H band starting at absolute z0."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, zb * H), 1)
    wz, dwz = _axis_weights(gz, zb, z0 + iota // H, need_grads)
    wy, dwy = _axis_weights(gy, H, iota % H, need_grads)
    A = (wz * wy).astype(jnp.bfloat16)
    if not need_grads:
        return A, None, None
    return A, (wz * dwy).astype(jnp.bfloat16), (dwz * wy).astype(jnp.bfloat16)


def _fwd_multi_kernel(rows_ref, gx_ref, gy_ref, gz_ref, seg_ref, out_ref,
                      *, D, H, W, Cg, K1, G, zb=None):
    def emit(band):
        outs = []
        for k in range(K1):
            if band:
                z0 = z0s[k]
                A, _, _ = _band_A(gy_ref[0, k, :], gz_ref[0, k, :], z0, H, zb,
                                  need_grads=False)
            else:
                A, _, _ = _build_A(gy_ref[0, k, :], gz_ref[0, k, :], D, H,
                                   need_grads=False)
            wx, _ = _x_weights(gx_ref[0, k, :], W, Cg * W, need_grad=False)
            for g in range(G):
                rows = (rows_ref[0, g, pl.ds(pl.multiple_of(z0 * H, H), zb * H), :]
                        if band else rows_ref[0, g])
                S = jnp.dot(A, rows, preferred_element_type=jnp.float32)
                outs.append(jnp.dot((S * wx).astype(jnp.bfloat16), seg_ref[:],
                                    preferred_element_type=jnp.float32))  # [VB, Cg]
        out_ref[0] = jnp.concatenate(outs, axis=-1)           # [VB, K1*G*Cg]

    if zb is None:
        emit(False)
        return
    z0s, fits = _z_band(gz_ref[0], D, zb)
    pl.when(fits)(lambda: emit(True))
    pl.when(jnp.logical_not(fits))(lambda: emit(False))


def warp_mm_fwd_multi_pallas(rows4, cgx, cgy, cgz, *, D, H, W, Cg, K1, G, VB,
                             zb=None):
    """rows4 [N, G, DH, Cg*W] bf16 (G contiguous channel groups); coords
    [N, K1, NV] f32.  Returns [N, NV, K1*G*Cg] f32 — channel (k, g, cg)
    ordering, i.e. k-major with the original channel order inside each k."""
    N, _, DH, CWg = rows4.shape
    NV = cgx.shape[2]
    bpz = NV // VB
    nb = N * bpz
    seg = _seg_matrix(Cg, W)

    cspec = pl.BlockSpec((1, K1, VB), lambda b, bpz=bpz: (b // bpz, 0, b % bpz),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_multi_kernel, D=D, H=H, W=W, Cg=Cg,
                               K1=K1, G=G, zb=zb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, NV, K1 * G * Cg), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, G, DH, CWg), lambda b, bpz=bpz: (b // bpz, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec, cspec, cspec,
            pl.BlockSpec((CWg, Cg), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, VB, K1 * G * Cg),
                               lambda b, bpz=bpz: (b // bpz, b % bpz, 0),
                               memory_space=pltpu.VMEM),
    )(rows4, cgx, cgy, cgz, seg)


def _dgrid_multi_kernel(rows_ref, gx_ref, gy_ref, gz_ref, gout_ref, segT_ref,
                        dgx_ref, dgy_ref, dgz_ref, *, D, H, W, Cg, K1,
                        zb=None):
    """One (n, g, z) grid step: coordinate-gradient PARTIALS from channel
    group g only (the G partials are summed outside the kernel — an XLA add
    over tiny [G,N,K1,NV] arrays).  Coordinate gradients via TWO matmuls per
    k instead of three: with U = (wx*gout)@rows^T and Ux = (dwx*gout)@rows^T
    (both [VB, DH]),
      dgx = rowsum(A  . Ux)   (reassociation of rowsum(S*dwx*gout))
      dgy = rowsum(Ay . U)    — U is SHARED by the y- and z-axis grads,
      dgz = rowsum(Az . U)      saving one VB*DH*CWg contraction per k.
    With zb set, the fitting-block path contracts against the zb*H band only
    (A/Ay/Az are exactly zero outside it — bit-identical grads)."""
    gout = gout_ref[0, 0]                                       # [VB, K1*Cg]

    def emit(band):
        dgxs, dgys, dgzs = [], [], []
        for k in range(K1):
            if band:
                z0 = z0s[k]
                A, Ay, Az = _band_A(gy_ref[0, k, :], gz_ref[0, k, :], z0, H,
                                    zb, need_grads=True)
                rows = rows_ref[0, 0,
                                pl.ds(pl.multiple_of(z0 * H, H), zb * H), :]
            else:
                A, Ay, Az = _build_A(gy_ref[0, k, :], gz_ref[0, k, :], D, H,
                                     need_grads=True)
                rows = rows_ref[0, 0]
            wx, dwx = _x_weights(gx_ref[0, k, :], W, Cg * W)
            gout_rep = jnp.dot(
                gout[:, k * Cg:(k + 1) * Cg].astype(jnp.bfloat16),
                segT_ref[:], preferred_element_type=jnp.float32)
            U = jax.lax.dot_general(
                (gout_rep * wx).astype(jnp.bfloat16), rows,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # [VB, band]
            Ux = jax.lax.dot_general(
                (gout_rep * dwx).astype(jnp.bfloat16), rows,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dgxs.append(jnp.sum(A * Ux, axis=-1))
            dgys.append(jnp.sum(Ay * U, axis=-1))
            dgzs.append(jnp.sum(Az * U, axis=-1))
        dgx_ref[0, 0] = jnp.stack(dgxs)                             # [K1, VB]
        dgy_ref[0, 0] = jnp.stack(dgys)
        dgz_ref[0, 0] = jnp.stack(dgzs)

    if zb is None:
        emit(False)
        return
    z0s, fits = _z_band(gz_ref[0], D, zb)
    pl.when(fits)(lambda: emit(True))
    pl.when(jnp.logical_not(fits))(lambda: emit(False))


def _drows_multi_kernel(gx_ref, gy_ref, gz_ref, gout_ref, segT_ref, drows_ref,
                        *, D, H, W, Cg, K1, zb=None):
    """One (n, g, z) grid step: scatter-as-matmul into group g's row block.

    The output block covers ONE channel group ((1,1,DH,CWg), revisited
    consecutively over the z steps) — a block spanning all G groups measured
    16.12M scoped vmem at the generator shape (G=4) and cannot fit; per-group
    blocks also let the voxel block grow.  Accumulates straight into the
    VMEM-resident output ref (a [DH,CWg] register accumulator would add its
    f32 size to the stack on top of the block itself).  With zb set, fitting
    blocks accumulate A_band^T @ upd into the band's row slice only."""
    z = pl.program_id(2)
    gout = gout_ref[0, 0]                                       # [VB, K1*Cg]

    @pl.when(z == 0)
    def _():
        drows_ref[:] = jnp.zeros_like(drows_ref)

    def emit(band):
        for k in range(K1):
            if band:
                z0 = z0s[k]
                A, _, _ = _band_A(gy_ref[0, k, :], gz_ref[0, k, :], z0, H, zb,
                                  need_grads=False)
            else:
                A, _, _ = _build_A(gy_ref[0, k, :], gz_ref[0, k, :], D, H,
                                   need_grads=False)
            wx, _ = _x_weights(gx_ref[0, k, :], W, Cg * W, need_grad=False)
            gout_rep = jnp.dot(
                gout[:, k * Cg:(k + 1) * Cg].astype(jnp.bfloat16),
                segT_ref[:], preferred_element_type=jnp.float32)
            upd = (gout_rep * wx).astype(jnp.bfloat16)
            dn = jax.lax.dot_general(
                A, upd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [band, CWg]
            if band:
                drows_ref[0, 0,
                          pl.ds(pl.multiple_of(z0 * H, H), zb * H), :] += dn
            else:
                drows_ref[0, 0] += dn

    if zb is None:
        emit(False)
        return
    z0s, fits = _z_band(gz_ref[0], D, zb)
    pl.when(fits)(lambda: emit(True))
    pl.when(jnp.logical_not(fits))(lambda: emit(False))


def warp_mm_bwd_multi_pallas(rows4, cgx, cgy, cgz, gout, *, D, H, W, Cg, K1, G,
                             VB_DGRID, VB_DROWS, zb=None):
    """gout [N, NV, K1*G*Cg] f32.  Returns (drows [N, G, DH, CWg] f32,
    dgx, dgy, dgz [N, K1, NV] f32).

    Grid is (N, G, bpz) with the voxel axis fastest: each step touches one
    channel group's rows/gout slice, so no block ever spans all G groups (the
    former single-axis grid OOM'd scoped vmem at the generator shape).  gout
    is relaid g-major ([N,G,NV,K1*Cg]) so the per-(k,g) column slices are
    static."""
    N, _, DH, CWg = rows4.shape
    NV = cgx.shape[2]
    segT = _seg_matrix(Cg, W).T                                      # [Cg, CWg]
    KCg = K1 * Cg
    # channel order in gout is (k, g, cg) — k-major; the kernels slice one g
    gout_g = (gout.reshape(N, NV, K1, G, Cg).transpose(0, 3, 1, 2, 4)
              .reshape(N, G, NV, KCg))

    rspec = pl.BlockSpec((1, 1, DH, CWg), lambda n, g, z: (n, g, 0, 0),
                         memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((Cg, CWg), lambda n, g, z: (0, 0),
                            memory_space=pltpu.VMEM)

    def cspec(vb):
        return pl.BlockSpec((1, K1, vb), lambda n, g, z: (n, 0, z),
                            memory_space=pltpu.VMEM)

    def gspec(vb):
        return pl.BlockSpec((1, 1, vb, KCg), lambda n, g, z: (n, g, z, 0),
                            memory_space=pltpu.VMEM)

    k1 = functools.partial(_dgrid_multi_kernel, D=D, H=H, W=W, Cg=Cg, K1=K1,
                           zb=zb)
    dgp = pl.pallas_call(
        k1,
        out_shape=(jax.ShapeDtypeStruct((G, N, K1, NV), jnp.float32),) * 3,
        grid=(N, G, NV // VB_DGRID),
        in_specs=[rspec, cspec(VB_DGRID), cspec(VB_DGRID), cspec(VB_DGRID),
                  gspec(VB_DGRID), seg_spec],
        out_specs=(pl.BlockSpec((1, 1, K1, VB_DGRID),
                                lambda n, g, z: (g, n, 0, z),
                                memory_space=pltpu.VMEM),) * 3,
    )(rows4, cgx, cgy, cgz, gout_g, segT)
    dgx, dgy, dgz = (p.sum(axis=0) for p in dgp)

    k2 = functools.partial(_drows_multi_kernel, D=D, H=H, W=W, Cg=Cg, K1=K1,
                           zb=zb)
    drows = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((N, G, DH, CWg), jnp.float32),
        grid=(N, G, NV // VB_DROWS),
        in_specs=[cspec(VB_DROWS), cspec(VB_DROWS), cspec(VB_DROWS),
                  gspec(VB_DROWS), seg_spec],
        out_specs=rspec,
    )(cgx, cgy, cgz, gout_g, segT)
    return drows, dgx, dgy, dgz


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(rows_ref, gx_ref, gy_ref, gz_ref, seg_ref, out_ref, *, D, H, W, C):
    gx = gx_ref[0, 0, :]
    gy = gy_ref[0, 0, :]
    gz = gz_ref[0, 0, :]
    A, _, _ = _build_A(gy, gz, D, H, need_grads=False)
    S = jnp.dot(A, rows_ref[0], preferred_element_type=jnp.float32)   # [VB, CW]
    wx, _ = _x_weights(gx, W, C * W, need_grad=False)
    # produce [C, VB] directly (segT contracted on CW): voxels stay on LANES
    # in HBM — a [P, C<8] layout would tile-pad the lane dim 128/C-fold
    out_ref[:] = jax.lax.dot_general(
        seg_ref[:], (S * wx).astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                           # [C, VB]


def warp_mm_fwd_pallas(rows3, gx, gy, gz, *, D, H, W, C, VB=1024):
    """rows3 [N, DH, CW] bf16; gx/gy/gz [P] f32 (n-major).  Returns [C, P] f32
    (channel-major so the big P axis rides the 128-lane tiling)."""
    N, DH, CW = rows3.shape
    P = gx.shape[0]
    assert P % (N * VB) == 0 and DH == D * H and CW == C * W, (P, N, VB, rows3.shape)
    nb = P // VB
    bps = nb // N                      # blocks per source
    # Mosaic block rule: last two block dims must divide (8,128) or equal the
    # array dims -> coords carried as [nb, 1, VB] with (1,1,VB) blocks
    g2 = lambda a: a.reshape(nb, 1, VB)
    segT = _seg_matrix(C, W).T         # [C, CW]

    kernel = functools.partial(_fwd_kernel, D=D, H=H, W=W, C=C)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, P), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, DH, CW), lambda b: (b // bps, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, VB), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, VB), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, VB), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, CW), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, VB), lambda b: (0, b), memory_space=pltpu.VMEM),
    )(rows3, g2(gx), g2(gy), g2(gz), segT)
    return out


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _gout_rep(goutT_blk, segT_blk):
    """goutT [C, VB] -> per-flat-position grad [VB, CW] via the seg indicator
    (both operands contracted on their first axis)."""
    return jax.lax.dot_general(
        goutT_blk.astype(jnp.bfloat16), segT_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dgrid_kernel(rows_ref, gx_ref, gy_ref, gz_ref, gout_ref, segT_ref,
                  dgx_ref, dgy_ref, dgz_ref, *, D, H, W, C):
    gx = gx_ref[0, 0, :]
    gy = gy_ref[0, 0, :]
    gz = gz_ref[0, 0, :]
    rows = rows_ref[0]

    A, Ay, Az = _build_A(gy, gz, D, H, need_grads=True)
    S = jnp.dot(A, rows, preferred_element_type=jnp.float32)
    Sy = jnp.dot(Ay, rows, preferred_element_type=jnp.float32)
    Sz = jnp.dot(Az, rows, preferred_element_type=jnp.float32)
    wx, dwx = _x_weights(gx, W, C * W)

    gout_rep = _gout_rep(gout_ref[:], segT_ref[:])                  # [VB, CW]

    dgx_ref[0, 0, :] = jnp.sum(S * dwx * gout_rep, axis=-1)
    dgy_ref[0, 0, :] = jnp.sum(Sy * wx * gout_rep, axis=-1)
    dgz_ref[0, 0, :] = jnp.sum(Sz * wx * gout_rep, axis=-1)


def _drows_kernel(gx_ref, gy_ref, gz_ref, gout_ref, segT_ref, drows_ref,
                  *, D, H, W, C, bps):
    b = pl.program_id(0)
    gx = gx_ref[0, 0, :]
    gy = gy_ref[0, 0, :]
    gz = gz_ref[0, 0, :]
    A, _, _ = _build_A(gy, gz, D, H, need_grads=False)
    wx, _ = _x_weights(gx, W, C * W, need_grad=False)
    gout_rep = _gout_rep(gout_ref[:], segT_ref[:])                  # [VB, CW]
    upd = (gout_rep * wx).astype(jnp.bfloat16)
    dn = jax.lax.dot_general(A, upd, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)    # [DH, CW]

    @pl.when(b % bps == 0)
    def _():
        drows_ref[:] = jnp.zeros_like(drows_ref)
    drows_ref[:] += dn[None]


def warp_mm_bwd_pallas(rows3, gx, gy, gz, goutT, *, D, H, W, C,
                       VB_DGRID=512, VB_DROWS=1024):
    """goutT [C, P] f32 (channel-major, see warp_mm_fwd_pallas).  Returns
    (drows [N, DH, CW] f32, dgx, dgy, dgz [P] f32).

    Two kernels with independent voxel-block sizes: the dgrid kernel holds
    A/Ay/Az + S/Sy/Sz + the rows block concurrently; the drows
    scatter-as-matmul kernel never touches rows at all (A^T @ upd only), so
    it runs a larger block.
    """
    N, DH, CW = rows3.shape
    P = gx.shape[0]
    segT = _seg_matrix(C, W).T                                       # [C, CW]

    def coords(vb):
        nb = P // vb
        g2 = lambda a: a.reshape(nb, 1, vb)
        return nb, g2(gx), g2(gy), g2(gz)

    def gspec(vb):
        return pl.BlockSpec((C, vb), lambda b: (0, b), memory_space=pltpu.VMEM)

    nb1, cgx, cgy, cgz = coords(VB_DGRID)
    bps1 = nb1 // N
    k1 = functools.partial(_dgrid_kernel, D=D, H=H, W=W, C=C)
    cspec = lambda vb: pl.BlockSpec((1, 1, vb), lambda b: (b, 0, 0),
                                    memory_space=pltpu.VMEM)
    dgx, dgy, dgz = pl.pallas_call(
        k1,
        out_shape=(jax.ShapeDtypeStruct((nb1, 1, VB_DGRID), jnp.float32),) * 3,
        grid=(nb1,),
        in_specs=[
            pl.BlockSpec((1, DH, CW), lambda b, bps=bps1: (b // bps, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec(VB_DGRID), cspec(VB_DGRID), cspec(VB_DGRID),
            gspec(VB_DGRID),
            pl.BlockSpec((C, CW), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(cspec(VB_DGRID),) * 3,
    )(rows3, cgx, cgy, cgz, goutT, segT)

    nb2, cgx, cgy, cgz = coords(VB_DROWS)
    bps2 = nb2 // N
    k2 = functools.partial(_drows_kernel, D=D, H=H, W=W, C=C, bps=bps2)
    drows = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((N, DH, CW), jnp.float32),
        grid=(nb2,),
        in_specs=[
            cspec(VB_DROWS), cspec(VB_DROWS), cspec(VB_DROWS),
            gspec(VB_DROWS),
            pl.BlockSpec((C, CW), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, DH, CW), lambda b, bps=bps2: (b // bps, 0, 0),
                               memory_space=pltpu.VMEM),
    )(cgx, cgy, cgz, goutT, segT)
    return drows, dgx.reshape(P), dgy.reshape(P), dgz.reshape(P)
