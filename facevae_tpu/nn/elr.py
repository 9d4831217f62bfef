"""Equalized-learning-rate layers (StyleGAN2 style).

Behavioral parity with reference LinearELR (modules.py:155-223 /
models_utils.py:134): weight stored as N(0,1)/lrmult, forward multiplies by
gain = act_gain * (1/sqrt(in)) * lrmult (or act_gain alone under "demod"
row-normalization).  Used by the dormant EFE/VAE variants (flatten_vae,
local_vae, EFE_linear...); the active flatten_vae_nl is parameter-free.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def _act_gain(act: Optional[str]) -> float:
    if act == "relu":
        return math.sqrt(2.0)
    if act == "leakyrelu":
        neg = 0.2
        return math.sqrt(2.0 / (1.0 + neg * neg))
    return 1.0


class LinearELR(nn.Module):
    in_features: int
    out_features: int
    lrmult: float = 1.0
    norm: Optional[str] = None       # None | "demod"
    act: Optional[str] = None        # None | "relu" | "leakyrelu"

    @nn.compact
    def __call__(self, x):
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) / self.lrmult,
            (self.out_features, self.in_features))
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))

        gain = _act_gain(self.act)
        w = weight
        if self.norm == "demod":
            w = w / jnp.linalg.norm(w, axis=1, keepdims=True).clip(1e-12)
        else:
            gain = gain * (1.0 / math.sqrt(self.in_features)) * self.lrmult

        y = jnp.matmul(x, (w * gain).T) + bias
        if self.act == "relu":
            y = nn.relu(y)
        elif self.act == "leakyrelu":
            y = nn.leaky_relu(y, negative_slope=0.2)
        return y
