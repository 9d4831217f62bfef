#!/usr/bin/env python
"""Honest fwd+bwd timing of the warp paths (DCE-proof).

The earlier check chained iterations but only read out[0] — XLA dead-code-
eliminated most of the backward (dgrid entirely), making the XLA path look
3-5x faster than it runs inside the real step (profiler: while.10 ~286ms).
Here every output feeds a scalar sum, so nothing can be eliminated.

Usage: python tools/microbench_warp.py            # XLA one-hot-matmul path
       FACEVAE_PALLAS_WARP=1 python tools/microbench_warp.py   # Pallas path
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from facevae_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from facevae_tpu.ops.fast_warp import grid_sample_3d_fast

N, D, H, W, C = 8, 16, 64, 64, 4
GPS = 16


def timed(f, *args, iters=10):
    out = jax.block_until_ready(f(*args))
    jax.device_get(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(out)
    return (time.time() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D, H, W, C), jnp.bfloat16)
    grid = jax.random.uniform(jax.random.fold_in(key, 1),
                              (N * GPS, D, H, W, 3), jnp.float32, -1.1, 1.1)

    fwd = jax.jit(lambda x, g: grid_sample_3d_fast(x, g, GPS)
                  .astype(jnp.float32).sum())

    def loss(x, g):
        return grid_sample_3d_fast(x, g, GPS).astype(jnp.float32).sum()

    both = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    mode = "pallas" if os.environ.get("FACEVAE_PALLAS_WARP") else "xla-mm"
    tf = timed(fwd, x, grid)
    tb = timed(both, x, grid)
    print(f"{mode}: fwd-sum {tf*1e3:7.2f} ms   fwd+bwd {tb*1e3:7.2f} ms "
          f"(bwd ~{(tb-tf)*1e3:6.2f} ms)")


if __name__ == "__main__":
    main()
