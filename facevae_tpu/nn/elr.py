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


class Conv2dELR(nn.Module):
    """Equalized-LR conv (reference models_utils.py:632-744, style modulation
    via `wsize` omitted — unused by the reference's active or conv6 paths).

    weight [out,in,kh,kw] ~ N(0,1); demod row-normalizes over (in,kh,kw);
    gain = act_gain * (1 if demod else 1/sqrt(in*k²))."""

    in_features: int
    out_features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    norm: Optional[str] = None
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        weight = self.param("weight", lambda key, s: jax.random.normal(key, s),
                            (self.out_features, self.in_features, k, k))
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        gain = _act_gain(self.act)
        w = weight
        if self.norm == "demod":
            w = w / jnp.sqrt((w * w).sum(axis=(1, 2, 3), keepdims=True)).clip(1e-12)
        else:
            gain = gain / math.sqrt(self.in_features * k * k)
        w = (w * gain).transpose(2, 3, 1, 0)                     # OIHW -> HWIO
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            [(self.padding, self.padding)] * 2, dimension_numbers=dn)
        y = y + bias.astype(y.dtype)
        return _apply_act(self.act, y)


class _ConvTransposeELR(nn.Module):
    """Equalized-LR transposed conv, dim-generic (reference
    models_utils.py:404-630).  weight init = blockinit: N(0,1) at kernel
    k//stride, nearest-repeated by stride; gain = act_gain * (stride^(d/2)
    under demod else 1/sqrt(in * k^d / stride^d)).  The reference's demod
    normdims for the 3D variant index out of range (dead code upstream);
    here demod normalizes over (in, *kernel) per out channel."""

    in_features: int
    out_features: int
    kernel_size: int
    stride: int
    padding: int
    dim: int = 2
    norm: Optional[str] = None
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        d = self.dim
        k, s = self.kernel_size, self.stride

        def init(key, shape):
            small = jax.random.normal(key, (self.in_features, self.out_features)
                                      + (k // s,) * d)
            for axis in range(2, 2 + d):
                small = jnp.repeat(small, s, axis=axis)
            return small                                        # [in,out,(k,)*d]

        weight = self.param("weight", init,
                            (self.in_features, self.out_features) + (k,) * d)
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        gain = _act_gain(self.act)
        if self.norm == "demod":
            axes = (0,) + tuple(range(2, 2 + d))
            w = weight / jnp.sqrt((weight * weight).sum(axis=axes, keepdims=True)).clip(1e-12)
            gain = gain * (s ** (d / 2.0))
        else:
            w = weight
            fan_in = self.in_features * (k ** d) / (s ** d)
            gain = gain / math.sqrt(fan_in)
        w = w * gain
        # torch conv_transpose weight is [in,out,*k]; lax transposed conv via
        # conv_general_dilated with lhs_dilation + spatially-flipped kernel.
        w = jnp.flip(w, axis=tuple(range(2, 2 + d)))
        perm = tuple(range(2, 2 + d)) + (0, 1)                   # -> (*k, in, out)
        w = w.transpose(perm)
        spatial = "DHW"[3 - d:]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C"))
        pad = [(k - 1 - self.padding, k - 1 - self.padding)] * d
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1,) * d, pad,
            lhs_dilation=(s,) * d, dimension_numbers=dn)
        y = y + bias.astype(y.dtype)
        return _apply_act(self.act, y)


class ConvTranspose1dELR(_ConvTransposeELR):
    """reference models_utils.py:290-401 (1D member of the vendored family;
    used by nothing in the reference model zoo — inventory completeness)."""
    dim: int = 1


class ConvTranspose2dELR(_ConvTransposeELR):
    dim: int = 2


class ConvTranspose3dELR(_ConvTransposeELR):
    dim: int = 3


class UpSampleBlock3d(nn.Module):
    """ConvTranspose3dELR(4,2,1) + skip-add (reference models_utils.py:946-963,
    used by EFE_conv6's decoder pyramid)."""

    in_features: int
    out_features: int
    norm: Optional[str] = None
    act: Optional[str] = "leakyrelu"

    @nn.compact
    def __call__(self, x0, x1):
        x = ConvTranspose3dELR(self.in_features, self.out_features, 4, 2, 1,
                               norm=self.norm, act=self.act, name="upconv")(x0)
        return x + x1


def _apply_act(act: Optional[str], y):
    if act == "relu":
        return nn.relu(y)
    if act == "leakyrelu":
        return nn.leaky_relu(y, negative_slope=0.2)
    return y


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
