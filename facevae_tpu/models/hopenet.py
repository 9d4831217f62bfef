"""Hopenet — frozen head-pose teacher (reference trainer.py:16-88).

torchvision-style ResNet (Bottleneck [3,4,6,3], expansion 4, stride on the
3x3 conv) with yaw/pitch/roll 66-bin heads; outputs expected angles in
radians.  Always runs in eval mode (frozen BN running stats).

Weights come from a converted `hopenet_robust_alpha1.pkl` when available
(tools/convert_torch_weights.py); otherwise deterministic random init — the
headpose distillation loss then trains against a random-but-fixed teacher,
which keeps the training graph identical (documented deviation, the artifact
cannot be downloaded in this environment).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from facevae_tpu.nn import Conv, Dense, BatchNorm
from facevae_tpu.ops.interpolate import max_pool_2d


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * self.expansion
        identity = x
        h = Conv(self.planes, 1, 1, 0, dim=2, use_bias=False, name="conv1")(x)
        h = BatchNorm(self.planes, name="bn1")(h, train)
        h = nn.relu(h)
        h = Conv(self.planes, 3, self.stride, 1, dim=2, use_bias=False, name="conv2")(h)
        h = BatchNorm(self.planes, name="bn2")(h, train)
        h = nn.relu(h)
        h = Conv(out_ch, 1, 1, 0, dim=2, use_bias=False, name="conv3")(h)
        h = BatchNorm(out_ch, name="bn3")(h, train)
        if self.downsample:
            identity = Conv(out_ch, 1, self.stride, 0, dim=2, use_bias=False,
                            name="downsample_conv")(x)
            identity = BatchNorm(out_ch, name="downsample_bn")(identity, train)
        return nn.relu(h + identity)


class Hopenet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    num_bins: int = 66

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(64, 7, 2, 3, dim=2, use_bias=False, name="conv1")(x)
        x = BatchNorm(64, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool_2d(x, 3, 2, 1)
        inplanes = 64
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            x = _Bottleneck(planes, stride, downsample=(stride != 1 or inplanes != planes * 4),
                            name=f"layer{li + 1}_0")(x, train)
            inplanes = planes * 4
            for bi in range(1, blocks):
                x = _Bottleneck(planes, 1, downsample=False,
                                name=f"layer{li + 1}_{bi}")(x, train)
        # reference avgpool is AvgPool2d(7) on 7x7 input -> global mean
        x = x.mean(axis=(1, 2))
        yaw = Dense(self.num_bins, name="fc_yaw")(x).astype(jnp.float32)
        pitch = Dense(self.num_bins, name="fc_pitch")(x).astype(jnp.float32)
        roll = Dense(self.num_bins, name="fc_roll")(x).astype(jnp.float32)

        idx = jnp.arange(self.num_bins, dtype=jnp.float32)
        def to_radians(logits):
            expect = (nn.softmax(logits, axis=1) * idx).sum(axis=1)
            return (expect - self.num_bins // 2) * 3.0 * math.pi / 180.0

        return to_radians(yaw), to_radians(pitch), to_radians(roll)
