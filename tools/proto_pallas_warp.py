#!/usr/bin/env python
"""Prototype: Pallas trilinear warp core vs the one-hot-matmul formulation.

Core problem: for P output voxels, each with fractional coords (gz,gy,gx)
into a [D,H,W,C] volume, compute the trilinear sample.  The (z,y) corner
lookup space is D*H rows; Mosaic supports lane gathers only WITHIN a 128
lane tile with matching [S,128] shapes, so the kernel does an 8-tile masked
search per corner:

  table vol_T [CW, D*H]  (C-major rows transposed: lanes = (z,y) row id)
  for each 128-voxel group: for each corner c in {00,01,10,11}:
      for tile k in 0..D*H/128: g = take_along_axis(vol_T[:,128k:], off)
      S_c = sum_k where(tile_id==k, g)
  out = sum_c w_c * x-interp(S_c)

Measures: pallas kernel vs XLA one-hot matmul on the MFE warp shape
(P=1<<16 voxels per chunk, D*H=1024, CW=256).
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

enable_compilation_cache()

D, H, W, C = 16, 64, 64, 4
DH = D * H
CW = C * W
P = 1 << 16           # voxels per call
VB = 512              # voxels per kernel block iteration (grid dim)


def warp_kernel(volT_ref, gx_ref, gy_ref, gz_ref, out_ref):
    """volT [CW, DH]; gx/gy/gz [1, P] unnormalized coords; out [P, C]."""
    volT = volT_ref[:]                      # [CW, DH] f32 in VMEM

    i = pl.program_id(0)
    gx = gx_ref[0, pl.ds(i * VB, VB)]
    gy = gy_ref[0, pl.ds(i * VB, VB)]
    gz = gz_ref[0, pl.ds(i * VB, VB)]

    x0 = jnp.floor(gx); tx = gx - x0
    y0 = jnp.floor(gy); ty = gy - y0
    z0 = jnp.floor(gz); tz = gz - z0

    acc = jnp.zeros((VB, C), jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            zc = z0 + dz
            yc = y0 + dy
            valid = ((zc >= 0) & (zc <= D - 1) & (yc >= 0) & (yc <= H - 1))
            r = (jnp.clip(zc, 0, D - 1).astype(jnp.int32) * H
                 + jnp.clip(yc, 0, H - 1).astype(jnp.int32))      # [VB]
            tile = r // 128
            off = r % 128                                          # [VB]
            # gather S_c [CW? no: per voxel column] -> organize voxels in lanes:
            # off2 [CW, VB] broadcast; per tile k gather along lanes of the
            # 128-wide tile slice... but table slice is [CW,128] and idx must
            # be [CW,128]; VB=512 -> do 4 sub-groups of 128 voxels
            sub = []
            for s in range(VB // 128):
                offs = off[s * 128:(s + 1) * 128]
                idx = jnp.broadcast_to(offs[None, :], (CW, 128)).astype(jnp.int32)
                tiles = tile[s * 128:(s + 1) * 128]
                g = jnp.zeros((CW, 128), jnp.float32)
                for k in range(DH // 128):
                    gk = jnp.take_along_axis(volT[:, k * 128:(k + 1) * 128], idx,
                                             axis=-1)
                    g = jnp.where((tiles == k)[None, :], gk.astype(jnp.float32), g)
                sub.append(g)
            S = jnp.concatenate(sub, axis=-1)                      # [CW, VB]
            # x-interp: S rows are c*W+x; per voxel pick x0, x0+1
            # reorganize: S -> [C, W, VB] ... W in sublanes: per voxel x
            # selection along sublanes is NOT supported; instead do the
            # x-interp as a weighted reduction like the XLA path:
            Sr = S.reshape(C, W, VB)
            xi = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
            x0i = x0.astype(jnp.int32)[None, None, :]
            w0 = jnp.where((xi == x0i) & (x0 >= 0)[None, None, :]
                           & (x0 <= W - 1)[None, None, :], 1.0, 0.0)
            w1 = jnp.where((xi == x0i + 1) & ((x0 + 1) >= 0)[None, None, :]
                           & ((x0 + 1) <= W - 1)[None, None, :], 1.0, 0.0)
            wx = (1.0 - tx)[None, None, :] * w0 + tx[None, None, :] * w1
            val = (Sr * wx).sum(1)                                 # [C, VB]
            wz = (1.0 - tz) if dz == 0 else tz
            wy = (1.0 - ty) if dy == 0 else ty
            wc = (wz * wy * valid.astype(jnp.float32))             # [VB]
            acc = acc + (val * wc[None, :]).T
    out_ref[pl.ds(i * VB, VB), :] = acc


def pallas_warp(volT, gx, gy, gz):
    return pl.pallas_call(
        warp_kernel,
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        grid=(P // VB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(volT, gx, gy, gz)


def onehot_warp(rows, gx, gy, gz):
    """The current XLA formulation for one chunk (fwd only)."""
    x0 = jnp.floor(gx); tx = gx - x0
    y0 = jnp.floor(gy); ty = gy - y0
    z0 = jnp.floor(gz); tz = gz - z0
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, DH), 1)
    A = jnp.zeros((P, DH), jnp.bfloat16)
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
            A = A + jnp.where(hit, (wz * wy)[:, None].astype(jnp.bfloat16),
                              jnp.bfloat16(0))
    S = jnp.dot(A, rows, preferred_element_type=jnp.float32)       # [P, CW]
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1) % W
    x0i = x0.astype(jnp.int32)[:, None]
    w0 = jnp.where((iota_x == x0i) & (x0 >= 0)[:, None] & (x0 <= W - 1)[:, None], 1.0, 0.0)
    w1 = jnp.where((iota_x == x0i + 1) & ((x0 + 1) >= 0)[:, None]
                   & ((x0 + 1) <= W - 1)[:, None], 1.0, 0.0)
    wx = (1.0 - tx)[:, None] * w0 + tx[:, None] * w1
    return (S * wx).reshape(P, C, W).sum(-1)


def ref_trilinear(vol, gx, gy, gz):
    """NumPy oracle (zeros padding, unnormalized coords)."""
    out = np.zeros((P, C), np.float32)
    x0 = np.floor(gx).astype(int); tx = gx - x0
    y0 = np.floor(gy).astype(int); ty = gy - y0
    z0 = np.floor(gz).astype(int); tz = gz - z0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                zc, yc, xc = z0 + dz, y0 + dy, x0 + dx
                val = ((zc >= 0) & (zc < D) & (yc >= 0) & (yc < H)
                       & (xc >= 0) & (xc < W))
                zi, yi, xi = np.clip(zc, 0, D - 1), np.clip(yc, 0, H - 1), np.clip(xc, 0, W - 1)
                v = vol[zi, yi, xi, :] * val[:, None]
                w = (np.where(dz, tz, 1 - tz) * np.where(dy, ty, 1 - ty)
                     * np.where(dx, tx, 1 - tx))
                out += v * w[:, None]
    return out


def timeit(fn, *args, iters=30):
    o = fn(*args)
    jax.device_get(o.reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        o = fn(*args)
    jax.device_get(o.reshape(-1)[0])
    return (time.time() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, (D, H, W, C), jnp.float32)
    # rows for the one-hot path: [DH, CW] C-major
    rows = vol.transpose(0, 1, 3, 2).reshape(DH, CW).astype(jnp.bfloat16)
    # volT for the pallas path: [CW, DH]
    # Mosaic dynamic_gather requires index/result bitwidth match -> f32 table
    volT = rows.T.astype(jnp.float32)
    ks = jax.random.split(key, 3)
    gx = jax.random.uniform(ks[0], (P,), jnp.float32, -1.5, W + 0.5)
    gy = jax.random.uniform(ks[1], (P,), jnp.float32, -1.5, H + 0.5)
    gz = jax.random.uniform(ks[2], (P,), jnp.float32, -1.5, D + 0.5)

    want = ref_trilinear(np.asarray(vol), np.asarray(gx), np.asarray(gy), np.asarray(gz))

    pw = jax.jit(pallas_warp)
    got = np.asarray(pw(volT, gx[None], gy[None], gz[None]))
    err = np.abs(got - want).max()
    print(f"pallas err vs oracle: {err:.4f} (bf16 table => ~1e-2 expected)")

    ow = jax.jit(onehot_warp)
    got2 = np.asarray(ow(rows, gx, gy, gz))
    err2 = np.abs(got2 - want).max()
    print(f"onehot err vs oracle: {err2:.4f}")

    tp = timeit(pw, volT, gx[None], gy[None], gz[None])
    to = timeit(ow, rows, gx, gy, gz)
    print(f"pallas: {tp*1e3:.3f} ms   onehot-matmul: {to*1e3:.3f} ms   "
          f"speedup {to/tp:.2f}x   ({P} voxels, CW={CW})")


if __name__ == "__main__":
    main()
