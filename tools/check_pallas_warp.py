#!/usr/bin/env python
"""Correctness + speed check of the fused Pallas warp kernels on the TPU.

Compares the pallas path against the XLA one-hot-matmul path (same math),
forward and VJP, on both warp shapes of the training step:
  - MFE warp:       C2=4 compressed volume, K+1=16 grids/source
  - generator warp: C=32 appearance volume, 1 grid/source
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


def check(N, D, H, W, C, GPS, label):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D, H, W, C), jnp.bfloat16)
    grid = jax.random.uniform(jax.random.fold_in(key, 1),
                              (N * GPS, D, H, W, 3), jnp.float32, -1.1, 1.1)
    plan = fw._pallas_plan(x, grid, GPS)
    assert plan is not None, f"pallas path not selected for {label}!"
    print(f"{label}: plan {plan}")

    f_p = jax.jit(lambda x, g: fw._fwd_pallas(x, g, GPS)[0])
    f_m = jax.jit(lambda x, g: fw._fwd_mm(x, g, GPS)[0])
    o_p = np.asarray(f_p(x, grid), np.float32)
    o_m = np.asarray(f_m(x, grid), np.float32)
    err = np.abs(o_p - o_m).max()
    scale = np.abs(o_m).max()
    print(f"  fwd pallas vs mm: max abs diff {err:.5f} (scale {scale:.2f})")
    assert err <= 0.02 * scale, "forward mismatch"

    gout = jax.random.normal(jax.random.fold_in(key, 2),
                             (N * GPS, D, H, W, C), jnp.float32)
    bwd_pallas = fw._bwd_pallas_ok(x, grid, GPS)
    if bwd_pallas:
        b_p = jax.jit(lambda x, g: fw._bwd_pallas(GPS, (x, g), gout))
        b_m = jax.jit(lambda x, g: fw._bwd_mm(GPS, (x, g), gout))
        dxp, dgp = b_p(x, grid)
        dxm, dgm = b_m(x, grid)
        for a, b, name in ((dxp, dxm, "dx"), (dgp, dgm, "dgrid")):
            a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
            e = np.abs(a - b).max(); sc = np.abs(b).max() + 1e-6
            print(f"  bwd {name}: max abs diff {e:.5f} (scale {sc:.2f})")
            assert e <= 0.03 * sc, name
    else:
        print("  bwd: pallas plan doesn't fit VMEM -> XLA-mm fallback")

    # timing: every output feeds the sum (DCE-proof, see microbench_warp.py)
    def timed(f, iters=10):
        def total(x, g):
            o = f(x, g)
            if isinstance(o, tuple):
                return sum(t.astype(jnp.float32).sum() for t in o)
            return o.astype(jnp.float32).sum()
        jf = jax.jit(total)
        jax.device_get(jf(x, grid))
        t0 = time.time()
        acc = [jf(x, grid) for _ in range(iters)]
        jax.device_get(acc[-1])
        return (time.time() - t0) / iters

    tfp = timed(lambda x, g: fw._fwd_pallas(x, g, GPS)[0])
    tfm = timed(lambda x, g: fw._fwd_mm(x, g, GPS)[0])
    print(f"  fwd: pallas {tfp*1e3:7.2f} ms   xla-mm {tfm*1e3:7.2f} ms   {tfm/tfp:5.2f}x")
    if bwd_pallas:
        tbp = timed(lambda x, g: fw._bwd_pallas(GPS, (x, g), gout))
        tbm = timed(lambda x, g: fw._bwd_mm(GPS, (x, g), gout))
        print(f"  bwd: pallas {tbp*1e3:7.2f} ms   xla-mm {tbm*1e3:7.2f} ms   {tbm/tbp:5.2f}x")


def check_multi(N, D, H, W, C, K1):
    """Fused k-looped kernels vs the per-(n,k) fallback (fwd + full VJP)."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (N, D, H, W, C), jnp.bfloat16)
    grids = jax.random.uniform(jax.random.fold_in(key, 1),
                               (N, K1, D, H, W, 3), jnp.float32, -1.1, 1.1)
    plan = fw._multi_plan(x, K1, D * H * W)
    assert plan is not None, "multi pallas plan missing!"
    print(f"multi warp (C={C}, K1={K1}): plan {plan}")

    def loss(x, g, fused):
        if fused:
            out = fw.grid_sample_3d_multi(x, g, K1)
        else:
            out = fw._multi_fallback_fwd(x, g, K1)
        return (out.astype(jnp.float32) ** 2).sum()

    v_p, (dx_p, dg_p) = jax.jit(jax.value_and_grad(
        lambda x, g: loss(x, g, True), argnums=(0, 1)))(x, grids)
    v_m, (dx_m, dg_m) = jax.jit(jax.value_and_grad(
        lambda x, g: loss(x, g, False), argnums=(0, 1)))(x, grids)
    for a, b, name, tol in ((v_p, v_m, "loss", 0.01), (dx_p, dx_m, "dx", 0.03),
                            (dg_p, dg_m, "dgrids", 0.03)):
        a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
        e = np.abs(a - b).max(); sc = np.abs(b).max() + 1e-6
        print(f"  multi {name}: max abs diff {e:.5f} (scale {sc:.2f})")
        assert e <= tol * sc, name

    def timed(f, iters=10):
        jf = jax.jit(f)
        jax.device_get(jf(x, grids))
        t0 = time.time()
        acc = [jf(x, grids) for _ in range(iters)]
        jax.device_get(acc[-1])
        return (time.time() - t0) / iters

    tp = timed(jax.value_and_grad(lambda x, g: loss(x, g, True), argnums=(0, 1)))
    tm = timed(jax.value_and_grad(lambda x, g: loss(x, g, False), argnums=(0, 1)))
    print(f"  fwd+bwd: fused {tp*1e3:7.2f} ms   per-(n,k) {tm*1e3:7.2f} ms   "
          f"{tm/tp:5.2f}x")


def check_banded(N=8, D=16, H=64, W=64, C=4, K1=16):
    """Z-banded kernels (default) vs FACEVAE_ZB=0 full-width kernels: outputs
    and grads must be BIT-identical (the band only drops exact-zero addends
    from fp32 accumulations), at both fit regimes."""
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (N, D, H, W, C), jnp.bfloat16)

    def affine_grids(theta_deg):
        th = np.deg2rad(theta_deg)
        jac = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                                 indexing="ij")
        gn = np.stack([xx / (W - 1) * 2 - 1, yy / (H - 1) * 2 - 1,
                       zz / (D - 1) * 2 - 1], -1).reshape(-1, 3) @ jac.T
        b = np.random.RandomState(0).randn(N, K1, 1, 3).astype(np.float32) * 0.1
        return jnp.asarray((gn[None, None] + b).reshape(N, K1, D, H, W, 3))

    def run(x, grids):
        def loss(x, g):
            out = fw.grid_sample_3d_multi(x, g, K1)
            return (out.astype(jnp.float32) ** 2).sum(), out
        (v, out), (dx, dg) = jax.jit(jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True))(x, grids)
        return jax.device_get((v, out, dx, dg))

    for theta, regime in ((4.0, "fit~1"), (45.0, "mixed/fallback")):
        grids = affine_grids(theta)
        os.environ["FACEVAE_ZB"] = "0"
        full = run(x, grids)
        os.environ.pop("FACEVAE_ZB")
        band = run(x, grids)
        # loss/out/dx are BIT-identical (the band drops exact-zero addends
        # from fp32 accumulations; the drows/S contractions are element-wise
        # the same).  dgrids' rowsum(A*U) reduction tree pairs the nonzero
        # taps differently at band width vs full width — fp32
        # reduction-order noise only.
        for a, b, name in zip(band[:3], full[:3], ("loss", "out", "dx")):
            same = np.array_equal(np.asarray(a), np.asarray(b))
            print(f"  banded vs full ({regime}) {name}: "
                  f"{'BIT-IDENTICAL' if same else 'MISMATCH'}")
            assert same, (regime, name,
                          float(np.abs(np.asarray(a, np.float64)
                                       - np.asarray(b, np.float64)).max()))
        dg_b = np.asarray(band[3], np.float64)
        dg_f = np.asarray(full[3], np.float64)
        e = np.abs(dg_b - dg_f).max()
        sc = np.abs(dg_f).max() + 1e-12
        print(f"  banded vs full ({regime}) dgrids: max abs {e:.2e} "
              f"(scale {sc:.2f}; fp32 reduction-order bound)")
        assert e <= 1e-4 * sc, (regime, e, sc)


def check_tps(N=8, H=256, W=256):
    """bf16 MXU TPS warp (pre-reflected coords, D=1 multi path) vs the exact
    fp32 gather path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from facevae_tpu.ops.tps import random_transform_params, transform_frame

    rng = np.random.RandomState(7)
    frame = jnp.asarray(rng.rand(N, H, W, 3), jnp.float32)
    tp = random_transform_params(jax.random.PRNGKey(3), N,
                                 sigma_affine=0.2, sigma_tps=0.02)
    exact = jax.jit(lambda f: transform_frame(tp, f))(frame)
    fast = jax.jit(lambda f: transform_frame(
        tp, f, compute_dtype=jnp.bfloat16))(frame)
    d = jnp.max(jnp.abs(exact - fast.astype(jnp.float32)))
    print(f"tps warp (N={N}, {H}x{W}): bf16-vs-fp32 max abs diff "
          f"{float(d):.5f} (pixel scale 1.0)")
    assert float(d) < 0.03, float(d)


def main():
    check_banded()
    check_multi(8, 16, 64, 64, 4, 16)       # MFE shape (G=1)
    check_multi(8, 16, 64, 64, 32, 1)       # generator shape (grouped, G=8)
    check(8, 16, 64, 64, 4, 16, "single-k kernels (fallback path)")
    check_tps()


if __name__ == "__main__":
    main()
