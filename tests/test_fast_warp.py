"""fast_warp == exact grid_sample_3d (values and gradients)."""
import numpy as np
import jax
import jax.numpy as jnp

from facevae_tpu.ops.grid_sample import grid_sample_3d
from facevae_tpu.ops.fast_warp import grid_sample_3d_fast


def _setup(rng, N=2, D=4, H=6, W=5, C=3, Do=3, Ho=4, Wo=7):
    x = jnp.asarray(rng.randn(N, D, H, W, C), jnp.float32)
    grid = jnp.asarray(rng.rand(N, Do, Ho, Wo, 3) * 3 - 1.5, jnp.float32)
    return x, grid


def test_forward_matches_exact(rng):
    x, grid = _setup(rng)
    ref = grid_sample_3d(x, grid, align_corners=True, padding_mode="zeros")
    fast = grid_sample_3d_fast(x, grid)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_gradients_match_exact(rng):
    x, grid = _setup(rng)
    g = jnp.asarray(rng.randn(*grid.shape[:-1], x.shape[-1]), jnp.float32)

    def loss_ref(x, grid):
        return jnp.sum(grid_sample_3d(x, grid, align_corners=True,
                                      padding_mode="zeros") * g)

    def loss_fast(x, grid):
        return jnp.sum(grid_sample_3d_fast(x, grid) * g)

    dx_r, dg_r = jax.grad(loss_ref, argnums=(0, 1))(x, grid)
    dx_f, dg_f = jax.grad(loss_fast, argnums=(0, 1))(x, grid)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg_f), np.asarray(dg_r), rtol=1e-4, atol=1e-4)


def test_mfe_like_shapes_and_bf16(rng):
    x = jnp.asarray(rng.randn(4, 4, 8, 8, 4), jnp.float32)
    grid = jnp.asarray(rng.rand(4, 4, 8, 8, 3) * 2 - 1, jnp.float32)
    ref = grid_sample_3d(x, grid)
    fast = grid_sample_3d_fast(x, grid)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5, atol=1e-6)

    xb = x.astype(jnp.bfloat16)
    fb = grid_sample_3d_fast(xb, grid)
    assert fb.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(fb).astype(np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_bf16_matmul_path_gradients(rng):
    """bf16 MXU path: values AND gradients close to the exact fp32 path."""
    x = jnp.asarray(rng.randn(2, 4, 8, 8, 4), jnp.float32)
    grid = jnp.asarray(rng.rand(4, 4, 8, 8, 3) * 2 - 1, jnp.float32)  # gps=2
    g = jnp.asarray(rng.randn(4, 4, 8, 8, 4), jnp.float32)

    def loss(fn, xx):
        return jnp.sum(fn(xx, grid, 2) * g)

    ref = grid_sample_3d_fast(x, grid, 2)
    fast = grid_sample_3d_fast(x.astype(jnp.bfloat16), grid, 2)
    np.testing.assert_allclose(np.asarray(fast).astype(np.float32),
                               np.asarray(ref), rtol=3e-2, atol=3e-2)

    dx_r, dg_r = jax.grad(lambda xx, gg: jnp.sum(grid_sample_3d_fast(xx, gg, 2) * g),
                          argnums=(0, 1))(x, grid)
    dx_f, dg_f = jax.grad(lambda xx, gg: jnp.sum(grid_sample_3d_fast(xx, gg, 2) * g),
                          argnums=(0, 1))(x.astype(jnp.bfloat16), grid)
    np.testing.assert_allclose(np.asarray(dx_f).astype(np.float32), np.asarray(dx_r),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(dg_f), np.asarray(dg_r),
                               rtol=5e-2, atol=0.15)


def test_grid_sample_3d_multi_fused_layout(rng):
    """grid_sample_3d_multi's fused k-major output equals the per-(n,k) op
    transposed into place, fwd and VJP (CPU exercises the fallback wiring;
    tools/check_pallas_warp.py compares the TPU kernels to this)."""
    import jax
    from facevae_tpu.ops.fast_warp import grid_sample_3d_fast, grid_sample_3d_multi

    N, D, H, W, C, K1 = 2, 4, 8, 8, 3, 5
    x = jnp.asarray(rng.randn(N, D, H, W, C), jnp.float32)
    grids = jnp.asarray(rng.rand(N, K1, D, H, W, 3) * 2.2 - 1.1, jnp.float32)

    fused = grid_sample_3d_multi(x, grids, K1)
    ref = grid_sample_3d_fast(x, grids.reshape(N * K1, D, H, W, 3), K1)
    ref = ref.reshape(N, K1, D, H, W, C).transpose(0, 2, 3, 4, 1, 5) \
        .reshape(N, D, H, W, K1 * C)
    # the wrapper routes through pixel-coordinate planes; the CPU fallback's
    # pixel->norm->pixel roundtrip adds ~1 ulp of coordinate noise (~1e-6 in
    # value through the tent slope)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=5e-6)

    def loss_fused(x, g):
        return (grid_sample_3d_multi(x, g, K1) ** 2).sum()

    def loss_ref(x, g):
        return (grid_sample_3d_fast(x, g.reshape(N * K1, D, H, W, 3), K1) ** 2).sum()

    (dx_f, dg_f) = jax.grad(loss_fused, argnums=(0, 1))(x, grids)
    (dx_r, dg_r) = jax.grad(loss_ref, argnums=(0, 1))(x, grids)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg_f),
                               np.asarray(dg_r).reshape(grids.shape),
                               rtol=1e-4, atol=1e-5)
