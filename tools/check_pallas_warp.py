#!/usr/bin/env python
"""Correctness + speed check of the fused Pallas warp kernels on the TPU.

Compares the pallas path against the XLA one-hot-matmul path (same math) and
the fp32 gather path (exact), forward and VJP, on the MFE warp shape.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from facevae_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from facevae_tpu.ops import fast_warp as fw

N, D, H, W, C = 8, 16, 64, 64, 4
GPS = 16  # grids per source (K+1)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D, H, W, C), jnp.bfloat16)
    grid = jax.random.uniform(jax.random.fold_in(key, 1),
                              (N * GPS, D, H, W, 3), jnp.float32, -1.1, 1.1)

    assert fw._pallas_ok(x, grid, GPS), "pallas path not selected!"

    def loss(x, grid, force):
        if force == "pallas":
            out = fw._fwd_pallas(x, grid, GPS)[0]
        elif force == "mm":
            out = fw._fwd_mm(x, grid, GPS)[0]
        return out

    f_p = jax.jit(lambda x, g: loss(x, g, "pallas"))
    f_m = jax.jit(lambda x, g: loss(x, g, "mm"))
    o_p = np.asarray(f_p(x, grid), np.float32)
    o_m = np.asarray(f_m(x, grid), np.float32)
    err = np.abs(o_p - o_m).max()
    scale = np.abs(o_m).max()
    print(f"fwd pallas vs mm: max abs diff {err:.5f} (scale {scale:.2f})")
    assert err <= 0.02 * scale, "forward mismatch"

    # VJP comparison through the public op (dispatch picks pallas on TPU)
    def scalar_pallas(x, g):
        dx, dg = fw._bwd_pallas(GPS, (x, g), gout)
        return dx, dg

    gout = jax.random.normal(jax.random.fold_in(key, 2),
                             (N * GPS, D, H, W, C), jnp.float32)
    b_p = jax.jit(lambda x, g: fw._bwd_pallas(GPS, (x, g), gout))
    b_m = jax.jit(lambda x, g: fw._bwd_mm(GPS, (x, g), gout))
    dxp, dgp = b_p(x, grid)
    dxm, dgm = b_m(x, grid)
    for a, b, name in ((dxp, dxm, "dx"), (dgp, dgm, "dgrid")):
        a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
        e = np.abs(a - b).max(); sc = np.abs(b).max() + 1e-6
        print(f"bwd {name}: max abs diff {e:.5f} (scale {sc:.2f})")
        assert e <= 0.03 * sc, name

    # timing (chained inside one jit)
    def chain(f, x, g, iters=20):
        @jax.jit
        def run(x, g):
            def body(i, acc):
                o = f(x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype), g)
                if isinstance(o, tuple):
                    o = o[0]
                return acc + o.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        jax.device_get(run(x, g))
        t0 = time.time()
        jax.device_get(run(x, g))
        return (time.time() - t0) / iters

    tfp = chain(lambda x, g: fw._fwd_pallas(x, g, GPS)[0], x, grid)
    tfm = chain(lambda x, g: fw._fwd_mm(x, g, GPS)[0], x, grid)
    tbp = chain(lambda x, g: fw._bwd_pallas(GPS, (x, g), gout), x, grid)
    tbm = chain(lambda x, g: fw._bwd_mm(GPS, (x, g), gout), x, grid)
    print(f"fwd: pallas {tfp*1e3:7.2f} ms   xla-mm {tfm*1e3:7.2f} ms   {tfm/tfp:5.2f}x")
    print(f"bwd: pallas {tbp*1e3:7.2f} ms   xla-mm {tbm*1e3:7.2f} ms   {tbm/tbp:5.2f}x")


if __name__ == "__main__":
    main()
