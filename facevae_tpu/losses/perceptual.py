"""Perceptual loss: pixel L1 + VGG-Face L1/255 + VGG19 L1 + image pyramid
(reference losses.py:123-151).

The reference's pyramid loop reuses stale loop variables, so the extra scales
apply ONLY relu_5_1 with weight 1.0 (quirk q3, losses.py:145-150).  That
behavior is replicated by default; fixed_pyramid=True applies all layer
weights at every scale.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from facevae_tpu.losses.vgg import VGGFeatures, VGG19_BLOCKS, VGG16_BLOCKS
from facevae_tpu.ops.normalization import apply_imagenet_normalization, apply_vggface_normalization
from facevae_tpu.ops.interpolate import resize_bilinear_half

LAYER_WEIGHTS = {"relu_1_1": 0.03125, "relu_2_1": 0.0625, "relu_3_1": 0.125,
                 "relu_4_1": 0.25, "relu_5_1": 1.0}


def _l1(a, b):
    return jnp.mean(jnp.abs(a.astype(jnp.float32)
                           - jax.lax.stop_gradient(b).astype(jnp.float32)))


class PerceptualLoss(nn.Module):
    n_scales: int = 3
    fixed_pyramid: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        min_size = 16 * (2 ** self.n_scales)   # deepest VGG tap needs >=16px
        if min(inp.shape[1:3]) < min_size:
            raise ValueError(
                f"PerceptualLoss with n_scales={self.n_scales} needs inputs "
                f">={min_size}px, got {inp.shape[1:3]}; lower LossConfig.n_scales")
        vgg19 = VGGFeatures(VGG19_BLOCKS, name="vgg19")
        vggface = VGGFeatures(VGG16_BLOCKS, name="vggface")

        loss = jnp.mean(jnp.abs(inp.astype(jnp.float32)
                                - target.astype(jnp.float32)))   # pixel L1 (target NOT detached here,
                                                 # matching losses.py:135)
        f_in = vggface(apply_vggface_normalization(inp))
        f_tg = vggface(apply_vggface_normalization(target))
        inp_n = apply_imagenet_normalization(inp)
        tgt_n = apply_imagenet_normalization(target)
        g_in = vgg19(inp_n)
        g_tg = vgg19(tgt_n)
        for layer, weight in LAYER_WEIGHTS.items():
            loss = loss + weight * _l1(f_in[layer], f_tg[layer]) / 255.0
            loss = loss + weight * _l1(g_in[layer], g_tg[layer])

        # image pyramid on the imagenet-normalized pair
        x, y = inp_n, tgt_n
        for _ in range(self.n_scales):
            x = resize_bilinear_half(x)
            y = resize_bilinear_half(y)
            gi, gt = vgg19(x), vgg19(y)
            if self.fixed_pyramid:
                for layer, weight in LAYER_WEIGHTS.items():
                    loss = loss + weight * _l1(gi[layer], gt[layer])
            else:
                # quirk q3: stale loop vars -> only the LAST (layer, weight)
                loss = loss + LAYER_WEIGHTS["relu_5_1"] * _l1(gi["relu_5_1"], gt["relu_5_1"])
        return loss
