"""Golden tests for the weight-normalized / untied-bias layer family
(facevae_tpu/nn/wn.py) against the actual torch formulas of reference
models_utils.py:116-132, 205-281, 747-835."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from facevae_tpu.nn import (LinearWN, Conv2dWN, ConvTranspose2dWN, Conv2dUB,
                            Conv2dWNUB, ConvTranspose2dWNUB, Conv3dUB,
                            downsample2d, dilate2d, fuse_wn)


def _set(v, **arrays):
    p = dict(v["params"])
    for k, a in arrays.items():
        p[k] = jnp.asarray(a)
    return {"params": p}


def test_linear_wn(rng):
    m = LinearWN(6, 4)
    x = rng.randn(3, 6).astype(np.float32)
    w = rng.randn(4, 6).astype(np.float32)
    g = rng.rand(4).astype(np.float32) + 0.5
    b = rng.randn(4).astype(np.float32)
    v = _set(m.init(jax.random.PRNGKey(0), jnp.zeros((1, 6))),
             weight=w, g=g, bias=b)
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    wnorm = np.sqrt((w ** 2).sum())
    expect = x @ (w * g[:, None] / wnorm).T + b
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_conv2d_wn_and_fuse(rng):
    m = Conv2dWN(3, 5, 3, strides=1, padding=1)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)
    g = rng.rand(5).astype(np.float32) + 0.5
    b = rng.randn(5).astype(np.float32)
    v = _set(m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))),
             weight=w, g=g, bias=b)
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    wnorm = np.sqrt((w ** 2).sum())
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)))
    expect = F.conv2d(xt, torch.as_tensor(w * g[:, None, None, None] / wnorm),
                      torch.as_tensor(b), padding=1)
    np.testing.assert_allclose(got, np.transpose(expect.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)

    # fuse(): effective weight stored (torch fuse parity), identical forward
    fused = {"params": fuse_wn(v["params"])}
    np.testing.assert_allclose(np.asarray(m.apply(fused, jnp.asarray(x))),
                               got, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["params"]["weight"]),
                               w * g[:, None, None, None] / wnorm, rtol=1e-5)


def test_conv_transpose2d_wn(rng):
    m = ConvTranspose2dWN(3, 5, 4, strides=2, padding=1)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    w = rng.randn(3, 5, 4, 4).astype(np.float32)   # torch [in,out,kh,kw]
    g = rng.rand(5).astype(np.float32) + 0.5
    b = rng.randn(5).astype(np.float32)
    v = _set(m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3))),
             weight=w, g=g, bias=b)
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    wnorm = np.sqrt((w ** 2).sum())
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)))
    expect = F.conv_transpose2d(
        xt, torch.as_tensor(w * g[None, :, None, None] / wnorm),
        torch.as_tensor(b), stride=2, padding=1)
    assert got.shape == (2, 8, 8, 5)
    np.testing.assert_allclose(got, np.transpose(expect.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


def test_fuse_wn_square_transpose(rng):
    """in_channels == out_channels: the [in,out,*k] transpose layout is
    indistinguishable from [out,in,*k] by shape, so fuse_wn must either skip
    (default) or fold on axis 1 when told — never silently fold axis 0."""
    m = ConvTranspose2dWN(4, 4, 3, strides=2, padding=1)
    x = rng.randn(2, 5, 5, 4).astype(np.float32)
    w = rng.randn(4, 4, 3, 3).astype(np.float32)
    g = rng.rand(4).astype(np.float32) + 0.5
    b = rng.randn(4).astype(np.float32)
    v = _set(m.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 5, 4))),
             weight=w, g=g, bias=b)
    got = np.asarray(m.apply(v, jnp.asarray(x)))

    # default: ambiguous layer left untouched -> forward unchanged
    fused = {"params": fuse_wn(v["params"])}
    np.testing.assert_array_equal(np.asarray(fused["params"]["weight"]), w)
    np.testing.assert_allclose(np.asarray(m.apply(fused, jnp.asarray(x))),
                               got, rtol=1e-5, atol=1e-6)

    # explicit transpose path: folds on axis 1, forward still unchanged and
    # the stored weight matches torch fuse()'s w*g/||w|| (g on out axis 1)
    fused = {"params": fuse_wn(v["params"], transpose_paths=[()])}
    wnorm = np.sqrt((w ** 2).sum())
    np.testing.assert_allclose(np.asarray(fused["params"]["weight"]),
                               w * g[None, :, None, None] / wnorm, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m.apply(fused, jnp.asarray(x))),
                               got, rtol=1e-4, atol=1e-5)


def test_untied_bias_variants(rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)
    bias_map = rng.randn(8, 8, 5).astype(np.float32)

    m = Conv2dUB(3, 5, 8, 8, 3, padding=1)
    v = _set(m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))),
             weight=w, bias=bias_map)
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)))
    expect = F.conv2d(xt, torch.as_tensor(w), None, padding=1) \
        + torch.as_tensor(np.transpose(bias_map, (2, 0, 1)))[None]
    np.testing.assert_allclose(got, np.transpose(expect.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)

    # WNUB: weight-normed + spatial bias
    g = rng.rand(5).astype(np.float32) + 0.5
    m = Conv2dWNUB(3, 5, 8, 8, 3, padding=1)
    v = _set(m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))),
             weight=w, g=g, bias=bias_map)
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    wnorm = np.sqrt((w ** 2).sum())
    expect = F.conv2d(xt, torch.as_tensor(w * g[:, None, None, None] / wnorm),
                      None, padding=1) \
        + torch.as_tensor(np.transpose(bias_map, (2, 0, 1)))[None]
    np.testing.assert_allclose(got, np.transpose(expect.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)

    # transpose WNUB shape check + 3D UB shape check
    mt = ConvTranspose2dWNUB(3, 5, 16, 16, 4, strides=2, padding=1)
    vt = mt.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    assert mt.apply(vt, jnp.asarray(x)).shape == (2, 16, 16, 5)
    m3 = Conv3dUB(3, 4, 4, 8, 8, 3, padding=1)
    x3 = jnp.asarray(rng.randn(1, 4, 8, 8, 3), jnp.float32)
    v3 = m3.init(jax.random.PRNGKey(2), x3)
    assert m3.apply(v3, x3).shape == (1, 4, 8, 8, 4)


def test_downsample_dilate(rng):
    x = rng.rand(1, 10, 10, 2).astype(np.float32)
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)))

    got = np.asarray(downsample2d(jnp.asarray(x), stride=2, padding=3))
    bk = torch.tensor([1.0, 6, 15, 20, 15, 6, 1])
    k = bk[:, None] * bk[None, :]
    k = (k / k.sum())[None, None].repeat(2, 1, 1, 1)
    expect = F.conv2d(xt, k, stride=2, padding=3, groups=2)
    np.testing.assert_allclose(got, np.transpose(expect.numpy(), (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-6)

    got = np.asarray(dilate2d(jnp.asarray(x), 3, padding=1))
    k = torch.full((2, 1, 3, 3), 1.0 / 9)
    expect = F.conv2d(xt, k, padding=1, groups=2).clamp(max=1.0)
    np.testing.assert_allclose(got, np.transpose(expect.numpy(), (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-6)
