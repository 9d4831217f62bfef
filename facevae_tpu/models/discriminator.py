"""Patch discriminator (reference models.py:1114-1139).

Input is concat(image, 2D gaussian keypoint heatmaps) = 3+K channels (kp are
stop-gradiented, reference detaches at models.py:1131).  Four strided
spectral-normed instance-norm leaky-relu blocks, then a CN logits head.
Returns (patch logits, list of intermediate features) for feature matching.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from facevae_tpu.nn import ConvBlock
from facevae_tpu.ops.heatmap import kp2gaussian_2d_cl


class Discriminator(nn.Module):
    down_seq: Sequence[int] = (64, 128, 256, 512)
    K: int = 15
    use_weight_norm: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, kp, train: bool = True):
        heat = kp2gaussian_2d_cl(jax.lax.stop_gradient(kp)[:, :, :2], x.shape[1:3])
        x = jnp.concatenate([x, heat.astype(x.dtype)], axis=-1)
        features = []
        x = ConvBlock("CNA", 3 + self.K, self.down_seq[0], 3, 2, 1,
                      self.use_weight_norm, dim=2, norm_type="instance",
                      nonlinearity_type="leakyrelu", name="block_0")(x, train)
        features.append(x)
        for i in range(len(self.down_seq) - 1):
            stride = 2 if i < len(self.down_seq) - 2 else 1
            x = ConvBlock("CNA", self.down_seq[i], self.down_seq[i + 1], 3, stride, 1,
                          self.use_weight_norm, dim=2, norm_type="instance",
                          nonlinearity_type="leakyrelu", name=f"block_{i + 1}")(x, train)
            features.append(x)
        out = ConvBlock("CN", self.down_seq[-1], 1, 3, 1, 1, self.use_weight_norm,
                        dim=2, norm_type="none", name="head")(x, train)
        return out, features
