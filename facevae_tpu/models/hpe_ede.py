"""HPE_EDE — head-pose estimator + scale head (reference models.py:990-1037).

ResNet-ish ResBottleneck stacks -> global mean pool -> 5 heads:
yaw/pitch/roll as 66-bin softmax expectations converted to radians,
translation t in R^3, scalar scale reshaped [N,1,1,1].
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from facevae_tpu.nn import ConvBlock, Dense, ResBottleneck
from facevae_tpu.ops.interpolate import max_pool_2d


class HPE_EDE(nn.Module):
    n_filters: Sequence[int] = (64, 256, 512, 1024, 2048)
    n_blocks: Sequence[int] = (3, 3, 5, 2)
    n_bins: int = 66
    K: int = 15
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        x = ConvBlock("CNA", 3, self.n_filters[0], 7, 2, 3, self.use_weight_norm,
                      dim=2, axis_name=ax)(x, train)
        x = max_pool_2d(x, 3, 2, 1)
        for i in range(len(self.n_filters) - 1):
            stride = 1 if i == 0 else 2
            x = ResBottleneck(self.n_filters[i], self.n_filters[i + 1], stride,
                              self.use_weight_norm, axis_name=ax)(x, train)
            for _ in range(self.n_blocks[i]):
                x = ResBottleneck(self.n_filters[i + 1], self.n_filters[i + 1], 1,
                                  self.use_weight_norm, axis_name=ax)(x, train)
        x = x.mean(axis=(1, 2))                                  # [N,F]
        # heads in fp32: pose angles / translations feed warp geometry
        yaw = Dense(self.n_bins, name="fc_yaw")(x).astype(jnp.float32)
        pitch = Dense(self.n_bins, name="fc_pitch")(x).astype(jnp.float32)
        roll = Dense(self.n_bins, name="fc_roll")(x).astype(jnp.float32)
        t = Dense(3, name="fc_t")(x).astype(jnp.float32)
        scale = Dense(1, name="fc_scale")(x).astype(jnp.float32)

        idx = jnp.arange(self.n_bins, dtype=jnp.float32)
        def to_radians(logits):
            expect = (nn.softmax(logits, axis=1) * idx).sum(axis=1)
            return (expect - self.n_bins // 2) * 3.0 * math.pi / 180.0

        yaw, pitch, roll = to_radians(yaw), to_radians(pitch), to_radians(roll)
        scale = scale.reshape(x.shape[0], 1, 1, 1)
        return yaw, pitch, roll, t, scale
