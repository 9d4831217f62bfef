#!/usr/bin/env python
"""Microbench: space-to-depth packed 3x3x3 conv vs plain NDHWC conv.

Low-channel 3D convs (C~32) pay a (C/128)^2 MXU utilization tax in XLA's
lane tiling.  Packing 2x2 spatial phases into channels (C -> 4C) raises
utilization ~16x at 4x the FLOPs (the packed 3-tap kernel carries structured
zeros) — expected ~4x net.  This validates correctness vs lax conv and times
both paths with chained iterations + a device_get hard sync (PERF.md
measurement rules).

Usage: python tools/microbench_s2d.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    def s2d_pack(x):
        N, D, H, W, C = x.shape
        x = x.reshape(N, D, H // 2, 2, W // 2, 2, C).transpose(0, 1, 2, 4, 3, 5, 6)
        return x.reshape(N, D, H // 2, W // 2, 4 * C)

    def s2d_unpack(x):
        N, D, M, Mx, C4 = x.shape
        C = C4 // 4
        x = x.reshape(N, D, M, Mx, 2, 2, C).transpose(0, 1, 2, 4, 3, 5, 6)
        return x.reshape(N, D, 2 * M, 2 * Mx, C)

    def s2d_pack_weight(w):
        kz, _, _, Ci, Co = w.shape
        wp = jnp.zeros((kz, 3, 3, 4 * Ci, 4 * Co), w.dtype)
        for qy in (0, 1):
            for py in (0, 1):
                for ty in (0, 1, 2):
                    dy = 2 * (ty - 1) + py - qy
                    if not -1 <= dy <= 1:
                        continue
                    for qx in (0, 1):
                        for px in (0, 1):
                            for tx in (0, 1, 2):
                                dx = 2 * (tx - 1) + px - qx
                                if not -1 <= dx <= 1:
                                    continue
                                wp = wp.at[:, ty, tx,
                                           (py * 2 + px) * Ci:(py * 2 + px + 1) * Ci,
                                           (qy * 2 + qx) * Co:(qy * 2 + qx + 1) * Co
                                           ].set(w[:, dy + 1, dx + 1])
        return wp

    def conv3(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(x, w, (1, 1, 1),
                                            [(1, 1)] * 3, dimension_numbers=dn)

    def packed_conv3(x, w):
        return s2d_unpack(conv3(s2d_pack(x), s2d_pack_weight(w)))

    rng = np.random.RandomState(0)
    shapes = [
        (8, 16, 64, 64, 32, 32),    # AFE res block
        (24, 16, 64, 64, 30, 30),   # EFE mix (3 EFE calls/step)
        (8, 16, 64, 64, 64, 32),    # MFE/CKD last up conv
        (8, 16, 32, 32, 64, 32),    # EFE up_3
    ]
    for (N, D, H, W, Ci, Co) in shapes:
        x = jnp.asarray(rng.rand(N, D, H, W, Ci), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, Ci, Co) * 0.05, jnp.bfloat16)

        # correctness (fp32, small slice)
        xs = jnp.asarray(np.asarray(x[:1, :4], np.float32))
        ws = jnp.asarray(np.asarray(w, np.float32))
        ref = conv3(xs, ws)
        got = packed_conv3(xs, ws)
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))

        ITERS = 30

        # NOTE: return a SCALAR — device_get of a 33MB result is
        # tunnel-transfer-bound on this runtime and swamps the compute time
        def chain_plain(x, w):
            def body(x, _):
                y = conv3(x, w)
                return (y[..., :x.shape[-1]] * 1e-3 + x
                        if y.shape[-1] >= x.shape[-1]
                        else x + 1e-3 * jnp.mean(y)), None
            return jnp.mean(jax.lax.scan(body, x, None, length=ITERS)[0]
                            .astype(jnp.float32))

        def chain_packed(x, w):
            # weight packing hoisted out of the loop (it's per-step work in
            # real training: one 144-slice scatter per conv per step)
            wp = s2d_pack_weight(w)
            xp = s2d_pack(x)
            def body(xp, _):
                y = conv3(xp, wp)
                return (y[..., :xp.shape[-1]] * 1e-3 + xp
                        if y.shape[-1] >= xp.shape[-1]
                        else xp + 1e-3 * jnp.mean(y)), None
            return jnp.mean(s2d_unpack(jax.lax.scan(body, xp, None,
                                                    length=ITERS)[0])
                            .astype(jnp.float32))

        for name, g in (("plain", jax.jit(chain_plain)),
                        ("packed", jax.jit(chain_packed))):
            r = g(x, w)
            jax.device_get(r)          # compile+warm
            t0 = time.time()
            r = g(x, w)
            jax.device_get(r)
            dt = (time.time() - t0) / ITERS
            fl = 2 * 27 * Ci * Co * N * D * H * W
            print(f"[{N},{D},{H},{W},{Ci}->{Co}] {name:6s} {dt*1e3:7.3f} ms "
                  f"{fl/dt/1e12:6.1f} TF/s(true-flops)"
                  + (f"   maxerr {err:.2e} (scale {scale:.1f})"
                     if name == "plain" else ""), flush=True)


if __name__ == "__main__":
    main()
