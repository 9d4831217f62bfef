#!/usr/bin/env python
"""Feasibility probe: lane-axis gathers inside a Pallas TPU kernel.

Question: can Mosaic lower jnp.take_along_axis(table, idx, axis=-1) where the
table's lane width is 128 / 1024 / 8192 / 65536?  If yes, a real trilinear
warp kernel (volume in VMEM, 4-8 gathers per voxel) replaces the one-hot
matmul formulation (which burns 1024x the useful FLOPs).

Usage: python tools/microbench_pallas_gather.py
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


def gather_kernel(table_ref, idx_ref, out_ref):
    table = table_ref[:]              # [S, T]
    idx = idx_ref[:]                  # [S, P]
    out_ref[:] = jnp.take_along_axis(table, idx, axis=-1)


def run_case(S, T, P, dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (S, T), dtype)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (S, P), 0, T)

    fn = pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((S, P), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jfn = jax.jit(fn)
    out = np.asarray(jfn(table, idx))
    ref = np.take_along_axis(np.asarray(table, np.float32),
                             np.asarray(idx), axis=-1)
    ok = np.allclose(out.astype(np.float32), ref)
    # timing
    jfn(table, idx)
    jax.device_get(jfn(table, idx)[0, 0])
    t0 = time.time()
    iters = 50
    for _ in range(iters):
        o = jfn(table, idx)
    jax.device_get(o[0, 0])
    dt = (time.time() - t0) / iters
    gbps = (S * P * table.dtype.itemsize) / dt / 1e9
    print(f"S={S:3d} T={T:6d} P={P:6d} {str(dtype.__name__):9s} ok={ok}  "
          f"{dt*1e6:9.1f} us  {gbps:8.1f} GB/s gathered")


def main():
    for (S, T, P) in [(8, 128, 1024), (8, 1024, 1024), (8, 1024, 8192),
                      (8, 8192, 8192), (8, 65536, 8192),
                      (32, 1024, 8192), (16, 65536, 8192)]:
        try:
            run_case(S, T, P)
        except Exception as e:
            print(f"S={S} T={T} P={P} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
