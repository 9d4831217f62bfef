"""Golden tests: grid_sample 2D/3D and interpolate vs torch.nn.functional.

These gate everything (SURVEY.md §7 hard part #1): exact align_corners +
padding-mode semantics of F.grid_sample (used at reference utils.py:176,
models.py:1103, trainer.py:110) and non-antialiased bilinear F.interpolate.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from facevae_tpu.ops import (
    grid_sample_2d, grid_sample_3d,
    interpolate_bilinear_2d, upsample_nearest_2d, upsample_nearest_3d,
    avg_pool_2d, avg_pool_3d, max_pool_2d,
)


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("pad", ["zeros", "border", "reflection"])
def test_grid_sample_2d(rng, align, pad):
    N, H, W, C = 2, 7, 9, 3
    x = rng.randn(N, H, W, C).astype(np.float32)
    # include strongly out-of-bounds coords to stress padding handling
    grid = (rng.rand(N, 5, 6, 2).astype(np.float32) * 4 - 2)
    got = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(grid),
                                    align_corners=align, padding_mode=pad))
    expect = F.grid_sample(torch.as_tensor(nchw(x)), torch.as_tensor(grid),
                           mode="bilinear", padding_mode=pad, align_corners=align)
    np.testing.assert_allclose(got, nhwc(expect.numpy()), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("pad", ["zeros", "border", "reflection"])
def test_grid_sample_3d(rng, align, pad):
    N, D, H, W, C = 2, 4, 6, 5, 3
    x = rng.randn(N, D, H, W, C).astype(np.float32)
    grid = (rng.rand(N, 3, 4, 5, 3).astype(np.float32) * 3 - 1.5)
    got = np.asarray(grid_sample_3d(jnp.asarray(x), jnp.asarray(grid),
                                    align_corners=align, padding_mode=pad))
    xt = torch.as_tensor(np.transpose(x, (0, 4, 1, 2, 3)))
    expect = F.grid_sample(xt, torch.as_tensor(grid),
                           mode="bilinear", padding_mode=pad, align_corners=align)
    np.testing.assert_allclose(got, np.transpose(expect.numpy(), (0, 2, 3, 4, 1)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_size,align", [((64, 64), False), ((224, 224), False),
                                            ((13, 17), False), ((50, 40), True)])
def test_interpolate_bilinear(rng, out_size, align):
    x = rng.rand(2, 32, 28, 3).astype(np.float32)
    got = np.asarray(interpolate_bilinear_2d(jnp.asarray(x), out_size, align_corners=align))
    expect = F.interpolate(torch.as_tensor(nchw(x)), size=out_size, mode="bilinear",
                           align_corners=align)
    np.testing.assert_allclose(got, nhwc(expect.numpy()), rtol=1e-4, atol=1e-5)


def test_interpolate_scale_quarter(rng):
    """EFE/CKD path: scale_factor=0.25, align_corners=False, recompute_scale_factor."""
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    got = np.asarray(interpolate_bilinear_2d(jnp.asarray(x), (16, 16), align_corners=False))
    expect = F.interpolate(torch.as_tensor(nchw(x)), scale_factor=0.25, mode="bilinear",
                           align_corners=False, recompute_scale_factor=True)
    np.testing.assert_allclose(got, nhwc(expect.numpy()), rtol=1e-4, atol=1e-5)


def test_pool_and_upsample(rng):
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(avg_pool_2d(jnp.asarray(x))),
        nhwc(F.avg_pool2d(torch.as_tensor(nchw(x)), 2).numpy()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(max_pool_2d(jnp.asarray(x), 3, 2, 1)),
        nhwc(F.max_pool2d(torch.as_tensor(nchw(x)), 3, 2, 1).numpy()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upsample_nearest_2d(jnp.asarray(x))),
        nhwc(F.interpolate(torch.as_tensor(nchw(x)), scale_factor=2, mode="nearest").numpy()),
        rtol=1e-6)

    v = rng.randn(2, 3, 4, 4, 5).astype(np.float32)
    vt = torch.as_tensor(np.transpose(v, (0, 4, 1, 2, 3)))
    np.testing.assert_allclose(
        np.asarray(avg_pool_3d(jnp.asarray(v), (1, 2, 2))),
        np.transpose(F.avg_pool3d(vt, (1, 2, 2)).numpy(), (0, 2, 3, 4, 1)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upsample_nearest_3d(jnp.asarray(v), (1, 2, 2))),
        np.transpose(F.interpolate(vt, scale_factor=(1, 2, 2), mode="nearest").numpy(),
                     (0, 2, 3, 4, 1)), rtol=1e-6)
