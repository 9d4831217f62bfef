#!/usr/bin/env python
"""Micro-benchmark: 3D convs as-is vs depth-folded 2D convs, on the MFE/AFE
shapes.  A (3,3,3) conv over [N,D,H,W,C] equals a (3,3) 2D conv over
[N*D,H,W,3C] where the 3C channels are the depth-shifted (-1,0,+1) copies.

Iterations are chained INSIDE one jit (fori_loop with input perturbation) so
per-dispatch tunnel latency doesn't pollute the numbers.

Usage: python tools/microbench_conv.py
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

ITERS = 30


def timed_loop(conv_fn, x, w):
    """Run conv ITERS times inside one jit; input perturbed per-iter so the
    loop body can't be hoisted.  Returns seconds per conv."""

    @jax.jit
    def run(x, w):
        def body(i, acc):
            y = conv_fn(x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype), w)
            return acc + y.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    jax.device_get(run(x, w))          # compile+warm
    t0 = time.time()
    jax.device_get(run(x, w))
    return (time.time() - t0) / ITERS


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def conv3d_folded(x, w):
    """x [N,D,H,W,C], w [3,3,3,C,Co] -> same result via 2D conv on [N*D,...]."""
    N, D, H, W, C = x.shape
    Co = w.shape[-1]
    zero = jnp.zeros((N, 1, H, W, C), x.dtype)
    xm = jnp.concatenate([zero, x[:, :-1]], axis=1)
    xp = jnp.concatenate([x[:, 1:], zero], axis=1)
    xcat = jnp.concatenate([xm, x, xp], axis=-1).reshape(N * D, H, W, 3 * C)
    w2 = w.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * C, Co)
    y = jax.lax.conv_general_dilated(
        xcat, w2, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y.reshape(N, D, H, W, Co)


def main():
    dt = jnp.bfloat16
    shapes = [
        (8, 16, 64, 64, 80, 64),
        (8, 16, 32, 32, 64, 128),
        (8, 16, 16, 16, 128, 256),
        (8, 16, 8, 8, 256, 512),
        (8, 16, 4, 4, 512, 1024),
        (8, 16, 64, 64, 32, 32),
        (8, 16, 64, 64, 112, 32),
    ]
    key = jax.random.PRNGKey(0)
    print(f"{'shape':34s} {'conv3d':>9s} {'folded2d':>9s} {'ratio':>6s} {'TF/s 3d':>8s} {'2d':>7s}")
    for (N, D, H, W, C, Co) in shapes:
        x = jax.random.normal(key, (N, D, H, W, C), dt)
        w = jax.random.normal(key, (3, 3, 3, C, Co), dt)
        y3 = np.asarray(jax.jit(conv3d)(x, w), np.float32)
        y2 = np.asarray(jax.jit(conv3d_folded)(x, w), np.float32)
        err = np.abs(y3 - y2).max() / (np.abs(y3).max() + 1e-6)
        t3 = timed_loop(conv3d, x, w)
        t2 = timed_loop(conv3d_folded, x, w)
        fl = 2 * N * D * H * W * 27 * C * Co
        print(f"N{N} D{D} {H}x{W} {C:4d}->{Co:4d} err{err:.0e}  "
              f"{t3*1e3:7.2f}ms {t2*1e3:7.2f}ms {t3/t2:5.2f}x "
              f"{fl/t3/1e12:7.2f} {fl/t2/1e12:6.2f}")


if __name__ == "__main__":
    main()
