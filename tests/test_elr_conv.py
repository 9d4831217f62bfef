"""ELR conv layers vs torch oracles (reference models_utils.py:404-744)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from facevae_tpu.nn import Conv2dELR, ConvTranspose2dELR, ConvTranspose3dELR, UpSampleBlock3d


def test_conv2d_elr_parity(rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    for norm in (None, "demod"):
        m = Conv2dELR(3, 6, 3, 1, 1, norm=norm, act="leakyrelu")
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = torch.as_tensor(np.asarray(v["params"]["weight"]))
        gain = math.sqrt(2.0 / 1.04)
        if norm == "demod":
            wn = w / w.flatten(1).norm(dim=1).view(-1, 1, 1, 1)
            weff = wn * gain
        else:
            weff = w * (gain / math.sqrt(3 * 9))
        expect = F.leaky_relu(F.conv2d(torch.as_tensor(np.transpose(x, (0, 3, 1, 2))),
                                       weff, torch.zeros(6), 1, 1), 0.2)
        got = m.apply(v, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got),
                                   np.transpose(expect.numpy(), (0, 2, 3, 1)),
                                   rtol=1e-4, atol=1e-5)


def test_conv_transpose3d_elr_parity(rng):
    x = rng.randn(2, 2, 4, 4, 3).astype(np.float32)       # NDHWC
    m = ConvTranspose3dELR(3, 5, 4, 2, 1, norm=None, act=None)
    v = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
    w = torch.as_tensor(np.asarray(v["params"]["weight"]))  # [in,out,4,4,4]
    # blockinit property: kernel constant over stride-2 blocks
    wn = np.asarray(v["params"]["weight"])
    assert np.allclose(wn[..., ::2, ::2, ::2], wn[..., 1::2, 1::2, 1::2])
    fan_in = 3 * (4 ** 3) / (2 ** 3)
    weff = w / math.sqrt(fan_in)
    xt = torch.as_tensor(np.transpose(x, (0, 4, 1, 2, 3)))
    expect = F.conv_transpose3d(xt, weff, torch.zeros(5), stride=2, padding=1)
    got = m.apply(v, jnp.asarray(x))
    assert got.shape == (2, 4, 8, 8, 5)
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(expect.numpy(), (0, 2, 3, 4, 1)),
                               rtol=1e-3, atol=1e-4)


def test_upsample_block3d(rng):
    x0 = jnp.asarray(rng.randn(1, 2, 4, 4, 8), jnp.float32)
    skip = jnp.asarray(rng.randn(1, 4, 8, 8, 4), jnp.float32)
    m = UpSampleBlock3d(8, 4)
    v = m.init(jax.random.PRNGKey(0), x0, skip)
    y = m.apply(v, x0, skip)
    assert y.shape == (1, 4, 8, 8, 4)


def test_conv_transpose1d_elr(rng):
    """1D member of the ELR transpose family (models_utils.py:290)."""
    from facevae_tpu.nn import ConvTranspose1dELR
    x = jnp.asarray(rng.randn(2, 6, 8), jnp.float32)      # [N, W, C]
    m = ConvTranspose1dELR(8, 4, 4, 2, 1)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 12, 4)
    assert bool(jnp.isfinite(y).all())
