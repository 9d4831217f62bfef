#!/usr/bin/env python
"""Feasibility + timing probe: z-BANDED one-hot-matmul warp blocks.

The warp kernels (ops/pallas/warp_mm.py) contract dense one-hot matrices
A [VB, D*H] against the full row matrix — 66-79% MXU but ~250x the useful
FLOPs.  Per-lane dynamic gathers are dead on this toolchain (PERF.md), but
voxel blocks are z-COHERENT: a block of consecutive output voxels samples z
inside a narrow band for realistic rotations.  This probes the middle ground:
per (block, k), compute the sampled-z band, and when it fits ZB values,
contract A_band [VB, ZB*H] against a DYNAMIC sublane slice of the rows block
(scalar-start pl.ds — supported, unlike per-lane gathers), falling back to
the full-width matmul under @pl.when otherwise.

Questions answered here:
  1. does Mosaic lower a scalar-dependent pl.ds sublane slice + predicated
     dual-path block?  2. numerics vs the exact XLA gather path.
  3. banded-vs-full kernel time at the MFE shape for fit rates {1.0, 0.0}.

Usage: python tools/proto_banded_warp.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facevae_tpu.utils import enable_compilation_cache


def _axis_weights(g, iota_axis):
    d = iota_axis.astype(jnp.float32) - g[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _seg_matrix(C, W):
    m = np.zeros((C * W, C), np.float32)
    for c in range(C):
        m[c * W:(c + 1) * W, c] = 1.0
    return jnp.asarray(m, jnp.bfloat16)


def bandonly_fwd_kernel(rows_ref, gx_ref, gy_ref, gz_ref, seg_ref, out_ref,
                        *, D, H, W, C, K1, ZB):
    """No fallback, no branch: always the banded matmul (WRONG for blocks
    whose z-range exceeds the band — pure perf isolation)."""
    CW = C * W
    iota_cw = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1) % W
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, ZB * H), 1)
    outs = []
    for k in range(K1):
        gx = gx_ref[0, k, :]
        gy = gy_ref[0, k, :]
        gz = gz_ref[0, k, :]
        wx = _axis_weights(gx, iota_cw)
        zc = jnp.clip(gz, 0.0, D - 1.0)
        lo = jnp.floor(jnp.min(zc)).astype(jnp.int32)
        z0 = jnp.minimum(lo, D - ZB)
        jb = z0 + iota_b // H
        wz = _axis_weights(gz, jb)
        wy = _axis_weights(gy, iota_b % H)
        A = (wz * wy).astype(jnp.bfloat16)                      # [VB, ZB*H]
        band = rows_ref[0, pl.ds(pl.multiple_of(z0 * H, H), ZB * H), :]
        S = jnp.dot(A, band, preferred_element_type=jnp.float32)
        outs.append(jnp.dot((S * wx).astype(jnp.bfloat16), seg_ref[:],
                            preferred_element_type=jnp.float32))
    out_ref[0] = jnp.concatenate(outs, axis=-1)


def blockwhen_fwd_kernel(rows_ref, gx_ref, gy_ref, gz_ref, seg_ref, out_ref,
                         *, D, H, W, C, K1, ZB):
    """ONE branch per block: all k share the block's jacobian so their
    z-ranges match; take the banded loop when EVERY k fits, else the full
    loop.  Both branches keep the concat-once output write."""
    CW = C * W
    iota_cw = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1) % W
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, ZB * H), 1)
    iota_dh = jax.lax.broadcasted_iota(jnp.int32, (1, D * H), 1)
    zc = jnp.clip(gz_ref[0], 0.0, D - 1.0)                       # [K1, VB]
    lo = jnp.floor(jnp.min(zc, axis=1)).astype(jnp.int32)        # [K1]
    hi = jnp.floor(jnp.max(zc, axis=1)).astype(jnp.int32)
    fits = jnp.max(hi - lo) <= (ZB - 2)
    z0s = jnp.minimum(lo, D - ZB)

    @pl.when(fits)
    def _():
        outs = []
        for k in range(K1):
            wx = _axis_weights(gx_ref[0, k, :], iota_cw)
            z0 = z0s[k]
            wz = _axis_weights(gz_ref[0, k, :], z0 + iota_b // H)
            wy = _axis_weights(gy_ref[0, k, :], iota_b % H)
            A = (wz * wy).astype(jnp.bfloat16)
            band = rows_ref[0, pl.ds(pl.multiple_of(z0 * H, H), ZB * H), :]
            S = jnp.dot(A, band, preferred_element_type=jnp.float32)
            outs.append(jnp.dot((S * wx).astype(jnp.bfloat16), seg_ref[:],
                                preferred_element_type=jnp.float32))
        out_ref[0] = jnp.concatenate(outs, axis=-1)

    @pl.when(jnp.logical_not(fits))
    def _():
        outs = []
        for k in range(K1):
            wx = _axis_weights(gx_ref[0, k, :], iota_cw)
            wz = _axis_weights(gz_ref[0, k, :], iota_dh // H)
            wy = _axis_weights(gy_ref[0, k, :], iota_dh % H)
            A = (wz * wy).astype(jnp.bfloat16)
            S = jnp.dot(A, rows_ref[0], preferred_element_type=jnp.float32)
            outs.append(jnp.dot((S * wx).astype(jnp.bfloat16), seg_ref[:],
                                preferred_element_type=jnp.float32))
        out_ref[0] = jnp.concatenate(outs, axis=-1)


def banded_fwd_kernel(rows_ref, gx_ref, gy_ref, gz_ref, seg_ref, out_ref,
                      *, D, H, W, C, K1, ZB):
    CW = C * W
    iota_cw = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1) % W
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, ZB * H), 1)
    iota_dh = jax.lax.broadcasted_iota(jnp.int32, (1, D * H), 1)
    for k in range(K1):
        gx = gx_ref[0, k, :]
        gy = gy_ref[0, k, :]
        gz = gz_ref[0, k, :]
        wx = _axis_weights(gx, iota_cw)
        zc = jnp.clip(gz, 0.0, D - 1.0)
        lo = jnp.floor(jnp.min(zc)).astype(jnp.int32)
        hi = jnp.floor(jnp.max(zc)).astype(jnp.int32)
        fits = (hi - lo) <= (ZB - 2)
        z0 = jnp.minimum(lo, D - ZB)

        @pl.when(fits)
        def _():
            jb = z0 + iota_b // H
            wz = _axis_weights(gz, jb)
            wy = _axis_weights(gy, iota_b % H)
            A = (wz * wy).astype(jnp.bfloat16)                  # [VB, ZB*H]
            band = rows_ref[0, pl.ds(pl.multiple_of(z0 * H, H), ZB * H), :]
            S = jnp.dot(A, band, preferred_element_type=jnp.float32)
            out_ref[0, :, k * C:(k + 1) * C] = jnp.dot(
                (S * wx).astype(jnp.bfloat16), seg_ref[:],
                preferred_element_type=jnp.float32)

        @pl.when(jnp.logical_not(fits))
        def _():
            wz = _axis_weights(gz, iota_dh // H)
            wy = _axis_weights(gy, iota_dh % H)
            A = (wz * wy).astype(jnp.bfloat16)                  # [VB, D*H]
            S = jnp.dot(A, rows_ref[0], preferred_element_type=jnp.float32)
            out_ref[0, :, k * C:(k + 1) * C] = jnp.dot(
                (S * wx).astype(jnp.bfloat16), seg_ref[:],
                preferred_element_type=jnp.float32)


def run_banded(rows3, cgx, cgy, cgz, *, D, H, W, C, K1, VB, ZB):
    N, DH, CW = rows3.shape
    NV = cgx.shape[2]
    bpz = NV // VB
    seg = _seg_matrix(C, W)
    cspec = pl.BlockSpec((1, K1, VB), lambda b, bpz=bpz: (b // bpz, 0, b % bpz),
                         memory_space=pltpu.VMEM)
    kfn = {"bandonly": bandonly_fwd_kernel,
           "blockwhen": blockwhen_fwd_kernel}.get(
        os.environ.get("MODE", ""), banded_fwd_kernel)
    kernel = functools.partial(kfn, D=D, H=H, W=W, C=C, K1=K1, ZB=ZB)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, NV, K1 * C), jnp.float32),
        grid=(N * bpz,),
        in_specs=[
            pl.BlockSpec((1, DH, CW), lambda b, bpz=bpz: (b // bpz, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec, cspec, cspec,
            pl.BlockSpec((CW, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, VB, K1 * C),
                               lambda b, bpz=bpz: (b // bpz, b % bpz, 0),
                               memory_space=pltpu.VMEM),
    )(rows3, cgx, cgy, cgz, seg)


def host_reference(x, cgx, cgy, cgz):
    """Exact trilinear (zeros padding) on host."""
    N, D, H, W, C = x.shape
    K1, NV = cgx.shape[1], cgx.shape[2]
    out = np.zeros((N, NV, K1 * C), np.float32)
    xf = np.asarray(x, np.float32)
    for n in range(N):
        for k in range(K1):
            gx, gy, gz = (np.asarray(a[n, k], np.float32)
                          for a in (cgx, cgy, cgz))
            x0 = np.floor(gx).astype(int)
            y0 = np.floor(gy).astype(int)
            z0 = np.floor(gz).astype(int)
            acc = np.zeros((NV, C), np.float32)
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        xi, yi, zi = x0 + dx, y0 + dy, z0 + dz
                        ok = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                              & (zi >= 0) & (zi < D))
                        w = (np.maximum(0, 1 - np.abs(xi - gx))
                             * np.maximum(0, 1 - np.abs(yi - gy))
                             * np.maximum(0, 1 - np.abs(zi - gz)))
                        v = xf[n, np.clip(zi, 0, D - 1), np.clip(yi, 0, H - 1),
                               np.clip(xi, 0, W - 1)]
                        acc += np.where(ok, w, 0.0)[:, None] * v
            out[n, :, k * C:(k + 1) * C] = acc
    return out


def main():
    enable_compilation_cache()
    from facevae_tpu.ops.pallas.warp_mm import warp_mm_fwd_multi_pallas

    N, D, H, W, C = 8, 16, 64, 64, 4
    K1, VB, ZB = 15, 512, int(os.environ.get("ZB", "8"))
    NV = D * H * W
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, D, H, W, C), jnp.bfloat16)
    rows3 = jnp.asarray(np.ascontiguousarray(
        np.asarray(x, np.float32).transpose(0, 1, 2, 4, 3)
    ).reshape(N, D * H, C * W), jnp.bfloat16)

    # coords: affine motion with controllable yaw -> controls band-fit rate
    def coords(theta_deg):
        th = np.deg2rad(theta_deg)
        jac = np.array([[np.cos(th), 0, np.sin(th)],
                        [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                                 indexing="ij")
        gn = np.stack([xx / (W - 1) * 2 - 1, yy / (H - 1) * 2 - 1,
                       zz / (D - 1) * 2 - 1], -1).reshape(NV, 3)
        q = gn @ jac.T
        b = rng.randn(N, K1, 3).astype(np.float32) * 0.1
        cg = q[None, None] + b[:, :, None]
        cgx = (cg[..., 0] + 1) * (W - 1) / 2
        cgy = (cg[..., 1] + 1) * (H - 1) / 2
        cgz = (cg[..., 2] + 1) * (D - 1) / 2
        return (jnp.asarray(cgx), jnp.asarray(cgy), jnp.asarray(cgz))

    def timed(f, *args, iters=20):
        out = f(*args)
        jax.device_get(out[0, 0])
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        jax.device_get(out[0, 0])
        return (time.time() - t0) / iters

    full = jax.jit(lambda a, b, c: warp_mm_fwd_multi_pallas(
        rows3[:, None], a, b, c, D=D, H=H, W=W, Cg=C, K1=K1, G=1, VB=VB))
    band = jax.jit(lambda a, b, c: run_banded(
        rows3, a, b, c, D=D, H=H, W=W, C=C, K1=K1, VB=VB, ZB=ZB))

    cg_small = coords(3.0)
    try:
        out_b = np.asarray(band(*cg_small))
    except Exception as e:
        print(f"BANDED KERNEL FAILED TO LOWER: {type(e).__name__}: "
              f"{str(e)[:500]}")
        return

    if not os.environ.get("SKIP_REF"):
        # numerics vs exact host reference (small problem slice: n=0..1)
        ref = host_reference(x[:2], cg_small[0][:2], cg_small[1][:2],
                             cg_small[2][:2])
        got = out_b[:2]
        err = np.abs(ref - got)
        rel = err.max() / max(1e-6, np.abs(ref).max())
        print(f"banded numerics vs exact host: max abs {err.max():.4f}  "
              f"rel {rel:.4f} (bf16 path; expect ~1-2%)")

    thetas = ((3.0, "fit~1.0"),) if os.environ.get("SKIP_BIG") \
        else ((3.0, "fit~1.0"), (40.0, "fit~0.0"))
    for theta, label in thetas:
        cg = coords(theta)
        zc = np.clip(np.asarray(cg[2]), 0, D - 1).reshape(N, K1, NV // VB, VB)
        lo = np.floor(zc.min(-1))
        hi = np.floor(zc.max(-1))
        fitrate = float(((hi - lo) <= ZB - 2).mean())
        tf = timed(full, *cg)
        tb = timed(band, *cg)
        print(f"theta={theta:5.1f}  measured fit rate {fitrate:.2f}   "
              f"full {tf*1e3:6.2f} ms   banded(ZB={ZB}) {tb*1e3:6.2f} ms   "
              f"speedup {tf/tb:4.2f}x  [{label}]")


if __name__ == "__main__":
    main()
