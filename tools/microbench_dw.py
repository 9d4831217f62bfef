#!/usr/bin/env python
"""A/B the conv weight-gradient formulations on the census's worst shapes.

XLA lowers dW as a conv contracting over batch (lane_eff N/128 = 6% at
batch 8, tools/conv_inventory.py); facevae_tpu.nn.layers.conv_cl replaces
it with shift-and-dot (one matmul per kernel offset, contraction over
N x out-spatial).  This tool times BOTH full VJPs (fwd+dx+dW; the dW is
the only difference) per shape with the hard device_get sync this runtime
requires (PERF.md "Measurement integrity": block_until_ready resolves
early; every output must feed the fetched scalar or XLA DCEs the bwd).

Usage: python tools/microbench_dw.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from facevae_tpu.utils import enable_compilation_cache
    from facevae_tpu.nn.layers import _conv_cl_mxu, _conv_cl_raw
    enable_compilation_cache()

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    # the three worst lane<1.0 dW families from tools/conv_inventory.py
    # (batch 8, 256^2 flagship config)
    cases = [
        ("mask 7x7 1792->256 @64^2", (8, 64, 64, 1792), (7, 7, 1792, 256),
         (1, 1), ((3, 3), (3, 3))),
        ("3d 128->256 @16x32^2", (8, 16, 32, 32, 128), (3, 3, 3, 128, 256),
         (1, 1, 1), ((1, 1), (1, 1), (1, 1))),
        ("3d 80->64 @16x64^2", (8, 16, 64, 64, 80), (3, 3, 3, 80, 64),
         (1, 1, 1), ((1, 1), (1, 1), (1, 1))),
    ]

    rng = np.random.RandomState(0)
    for name, xs, ws, st, pd in cases:
        x = jnp.asarray(rng.randn(*xs).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.randn(*ws) * 0.05).astype(np.float32)
                        ).astype(jnp.bfloat16)

        def make(fn):
            def loss(x, w):
                y = fn(x, w, st, pd)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            @jax.jit
            def step(x, w):
                l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
                # DCE-proof: every grad feeds the fetched scalar
                return l + jnp.sum(gx.astype(jnp.float32) ** 2) \
                         + jnp.sum(gw.astype(jnp.float32) ** 2)
            return step

        row = [name]
        for label, fn in [("xla", _conv_cl_raw), ("mxu", _conv_cl_mxu)]:
            step = make(fn)
            jax.device_get(step(x, w))            # compile + settle
            t0 = time.time()
            acc = None
            for _ in range(iters):
                acc = step(x, w)
            jax.device_get(acc)                   # hard sync
            dt = (time.time() - t0) / iters * 1e3
            row.append(f"{label} {dt:7.2f} ms")
        gf = 2 * np.prod(xs) / np.prod(st) * np.prod(ws[:-2]) * ws[-1] / 1e9
        print(f"{row[0]:28s} {row[1]}  {row[2]}   (fwd {gf:7.1f} GFLOP, "
              f"vjp ~3x)")


if __name__ == "__main__":
    main()
