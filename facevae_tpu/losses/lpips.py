"""LPIPS perceptual distance (the criterion of the dormant
ContrastiveLoss_conv, reference losses.py:284-286, which pulls
`taming.modules.losses.lpips.LPIPS`).

Structure mirrors taming's LPIPS: a fixed input scaling layer, a frozen VGG16
feature stack tapped at the LAST relu of each block (relu1_2, relu2_2,
relu3_3, relu4_3, relu5_3 — deeper taps than the perceptual loss' relu_i_1),
channel-unit-normalized feature differences, and per-layer 1x1 "lin" heads
averaged spatially and summed.

Like the other teachers (losses/vgg.py), weights are deterministic random
init unless converted artifacts are provided — a fixed random VGG is still a
valid perceptual metric and keeps the training graph identical.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from facevae_tpu.nn import Conv
from facevae_tpu.ops.interpolate import max_pool_2d

# full VGG16 conv widths per block (LPIPS taps the END of each block)
_VGG16_FULL: Tuple[Tuple[int, ...], ...] = ((64, 64), (128, 128), (256, 256, 256),
                                            (512, 512, 512), (512, 512, 512))

# taming ScalingLayer constants (channel-last here)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    return x / (n + eps)


class LPIPS(nn.Module):
    """Frozen LPIPS distance.  Inputs [N,H,W,3] in [-1,1]; returns [N]."""

    @nn.compact
    def __call__(self, x, y) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)

        # construct each submodule exactly once; the two stack() calls share them
        convs = [[Conv(width, 3, 1, 1, dim=2, name=f"conv{bi + 1}_{ci + 1}")
                  for ci, width in enumerate(widths)]
                 for bi, widths in enumerate(_VGG16_FULL)]

        def stack(v):
            v = (v - shift) / scale
            taps = []
            for bi, block in enumerate(convs):
                if bi > 0:
                    v = max_pool_2d(v, 2, 2, 0)
                for conv in block:
                    v = nn.relu(conv(v))
                taps.append(v)
            return taps

        fx, fy = stack(x), stack(y)
        total = jnp.zeros((x.shape[0],), jnp.float32)
        for i, (a, b) in enumerate(zip(fx, fy)):
            diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            val = Conv(1, 1, 1, 0, dim=2, use_bias=False,
                       name=f"lin_{i}")(diff.astype(x.dtype))
            total = total + val.astype(jnp.float32).mean(axis=(1, 2, 3))
        return total
