"""Weight-normalized + untied-bias layer family (reference
models_utils.py:116-132, 205-281, 747-835 — vendored Meta codebase surface).

None of these are used by the reference's active or dormant model paths (see
SURVEY.md §2.1 row 6); they are part of the extended-primitive inventory and
are built here for completeness:

  LinearWN / Conv2dWN / ConvTranspose2dWN — weight normalization with a
    GLOBAL Frobenius norm (sqrt(sum(w²)) over the WHOLE tensor, not per-row)
    and a per-out-channel gain g:  w_eff = w * g / ||w||_F.
  *UB — untied bias: a full [*spatial, out] bias map instead of a vector.
  *WNUB — both.
  Downsample2d — depthwise binomial-7² blur (stylegan-style antialias).
  Dilate2d — depthwise box blur clamped to 1 (mask dilation).

The reference's fuse() folds g into the weight in-place for inference; in a
functional setting use `fuse_wn(params)` which returns a new params tree with
g folded in and set to 1 (numerically identical forward).

Channel-last layouts throughout; weights stored in torch layout
([out,in,*k] / [in,out,*k]) so utils_port order-zips them unchanged.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from facevae_tpu.nn.init import torch_kernel_init, torch_bias_init


def _wn(weight, g):
    """w * g / ||w||_F with g broadcast over out-channel axis 0."""
    wnorm = jnp.sqrt(jnp.sum(weight.astype(jnp.float32) ** 2))
    shape = (g.shape[0],) + (1,) * (weight.ndim - 1)
    return weight * (g.reshape(shape) / wnorm).astype(weight.dtype)


class LinearWN(nn.Module):
    """reference models_utils.py:116-132."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", torch_kernel_init(self.in_features),
                            (self.out_features, self.in_features))
        g = self.param("g", nn.initializers.ones, (self.out_features,))
        y = jnp.matmul(x, _wn(weight, g).T)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(self.in_features),
                              (self.out_features,))
            y = y + bias
        return y


def _conv_cl(x, w_oik, strides, padding, dim):
    """Channel-last conv with torch-layout weight [out,in,*k]."""
    perm = tuple(range(2, 2 + dim)) + (1, 0)                 # -> (*k, in, out)
    w = w_oik.transpose(perm)
    spatial = "DHW"[3 - dim:]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (strides,) * dim,
        [(padding, padding)] * dim, dimension_numbers=dn)


def _conv_transpose_cl(x, w_iok, strides, padding, dim):
    """Channel-last transposed conv with torch-layout weight [in,out,*k]."""
    k = w_iok.shape[2]
    w = jnp.flip(w_iok, axis=tuple(range(2, 2 + dim)))
    perm = tuple(range(2, 2 + dim)) + (0, 1)                 # -> (*k, in, out)
    w = w.transpose(perm)
    spatial = "DHW"[3 - dim:]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C"))
    pad = [(k - 1 - padding, k - 1 - padding)] * dim
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,) * dim, pad,
        lhs_dilation=(strides,) * dim, dimension_numbers=dn)


class Conv2dWN(nn.Module):
    """reference models_utils.py:244-255."""

    in_channels: int
    out_channels: int
    kernel_size: int
    strides: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        weight = self.param("weight", torch_kernel_init(fan_in),
                            (self.out_channels, self.in_channels, k, k))
        g = self.param("g", nn.initializers.ones, (self.out_channels,))
        bias = self.param("bias", torch_bias_init(fan_in), (self.out_channels,))
        y = _conv_cl(x, _wn(weight, g), self.strides, self.padding, 2)
        return y + bias.astype(y.dtype)


class ConvTranspose2dWN(nn.Module):
    """reference models_utils.py:747-771."""

    in_channels: int
    out_channels: int
    kernel_size: int
    strides: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        weight = self.param("weight", torch_kernel_init(fan_in),
                            (self.in_channels, self.out_channels, k, k))
        # WN's g broadcasts over OUT channels = axis 1 of the transpose layout
        g = self.param("g", nn.initializers.ones, (self.out_channels,))
        wnorm = jnp.sqrt(jnp.sum(weight.astype(jnp.float32) ** 2))
        w = weight * (g[None, :, None, None] / wnorm).astype(weight.dtype)
        bias = self.param("bias", torch_bias_init(fan_in), (self.out_channels,))
        y = _conv_transpose_cl(x, w, self.strides, self.padding, 2)
        return y + bias.astype(y.dtype)


class _UntiedBias(nn.Module):
    """Shared machinery for the UB variants: bias is a full spatial map.

    torch stores bias [out, *spatial]; channel-last here -> [*spatial, out].
    """

    in_channels: int
    out_channels: int
    spatial: Tuple[int, ...]          # (H,W) or (D,H,W) of the OUTPUT
    kernel_size: int
    strides: int = 1
    padding: int = 0
    transpose: bool = False
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        d = len(self.spatial)
        k = self.kernel_size
        fan_in = self.in_channels * k ** d
        wshape = ((self.in_channels, self.out_channels) if self.transpose
                  else (self.out_channels, self.in_channels)) + (k,) * d
        weight = self.param("weight", torch_kernel_init(fan_in), wshape)
        if self.weight_norm:
            g = self.param("g", nn.initializers.ones, (self.out_channels,))
            if self.transpose:
                wnorm = jnp.sqrt(jnp.sum(weight.astype(jnp.float32) ** 2))
                shape = (1, self.out_channels) + (1,) * d
                weight = weight * (g.reshape(shape) / wnorm).astype(weight.dtype)
            else:
                weight = _wn(weight, g)
        bias = self.param("bias", nn.initializers.zeros,
                          self.spatial + (self.out_channels,))
        if self.transpose:
            y = _conv_transpose_cl(x, weight, self.strides, self.padding, d)
        else:
            y = _conv_cl(x, weight, self.strides, self.padding, d)
        return y + bias.astype(y.dtype)[None]


def Conv2dUB(in_channels, out_channels, height, width, kernel_size, **kw):
    """reference models_utils.py:257-267."""
    return _UntiedBias(in_channels, out_channels, (height, width), kernel_size,
                       transpose=False, weight_norm=False, **kw)


def Conv2dWNUB(in_channels, out_channels, height, width, kernel_size, **kw):
    """reference models_utils.py:269-281."""
    return _UntiedBias(in_channels, out_channels, (height, width), kernel_size,
                       transpose=False, weight_norm=True, **kw)


def ConvTranspose2dUB(in_channels, out_channels, height, width, kernel_size, **kw):
    """reference models_utils.py:773-783."""
    return _UntiedBias(in_channels, out_channels, (height, width), kernel_size,
                       transpose=True, weight_norm=False, **kw)


def ConvTranspose2dWNUB(in_channels, out_channels, height, width, kernel_size, **kw):
    """reference models_utils.py:785-811."""
    return _UntiedBias(in_channels, out_channels, (height, width), kernel_size,
                       transpose=True, weight_norm=True, **kw)


def Conv3dUB(in_channels, out_channels, depth, height, width, kernel_size, **kw):
    """reference models_utils.py:813-823."""
    return _UntiedBias(in_channels, out_channels, (depth, height, width),
                       kernel_size, transpose=False, weight_norm=False, **kw)


def ConvTranspose3dUB(in_channels, out_channels, depth, height, width,
                      kernel_size, **kw):
    """reference models_utils.py:825-835."""
    return _UntiedBias(in_channels, out_channels, (depth, height, width),
                       kernel_size, transpose=True, weight_norm=False, **kw)


def downsample2d_kernel() -> jnp.ndarray:
    """Binomial-7 separable blur kernel, normalized (models_utils.py:213-215)."""
    b = jnp.asarray([1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0])
    k = b[:, None] * b[None, :]
    return k / k.sum()


def downsample2d(x, stride: int = 1, padding: Union[int, str] = 0):
    """Depthwise binomial blur (reference Downsample2d, models_utils.py:205-224).

    x [N,H,W,C]; padding int or "reflect" (3px reflect pad, as upstream).
    """
    C = x.shape[-1]
    k = downsample2d_kernel().astype(x.dtype)
    w = jnp.broadcast_to(k[:, :, None, None], (7, 7, 1, C))
    if padding == "reflect":
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        pad = [(0, 0), (0, 0)]
    else:
        pad = [(padding, padding)] * 2
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=dn,
        feature_group_count=C)


def dilate2d(x, kernel_size: int, stride: int = 1, padding: int = 0):
    """Depthwise box blur clamped at 1 (reference Dilate2d,
    models_utils.py:226-242) — a soft mask dilation."""
    C = x.shape[-1]
    k = jnp.full((kernel_size, kernel_size), 1.0 / kernel_size ** 2, x.dtype)
    w = jnp.broadcast_to(k[:, :, None, None], (kernel_size, kernel_size, 1, C))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=dn, feature_group_count=C)
    return jnp.clip(y, max=1.0)


def fuse_wn(params: Dict[str, Any],
            transpose_paths: Sequence[Tuple[str, ...]] = ()) -> Dict[str, Any]:
    """Fold every WN layer's g into its weight (reference fuse(),
    models_utils.py:122-125,755-758): the stored weight becomes the effective
    weight w*g/||w||_F, exactly as torch's fuse() writes it.  Because these
    functional modules always re-normalize, g is set to ||w_eff||_F so the
    normalization becomes the identity — forward outputs are unchanged.

    The out-channel axis is 0 for conv/linear torch layouts ([out,in,*k]) and
    1 for transposed-conv layouts ([in,out,*k]).  When in_channels ==
    out_channels the layouts are indistinguishable from shapes alone; such
    layers are left UNFUSED (still numerically correct — the module
    re-normalizes either way) unless their tree path is listed in
    `transpose_paths` (fold on axis 1) — inferring the axis there would
    silently fold along the wrong axis for square transpose layers."""
    transpose_set = {tuple(p) for p in transpose_paths}
    consumed = set()

    def visit(node, path):
        if not isinstance(node, dict):
            return node
        if "weight" in node and "g" in node and not isinstance(node["weight"], dict):
            w, g = node["weight"], node["g"]
            o = g.shape[0]
            if path in transpose_set:
                consumed.add(path)
                axis = 1
            elif w.ndim > 2 and w.shape[0] == o and w.shape[1] == o:
                return node          # ambiguous square layout: skip (see doc)
            else:
                axis = 0 if w.shape[0] == o else 1
            shape = tuple(o if i == axis else 1 for i in range(w.ndim))
            wnorm = jnp.sqrt(jnp.sum(jnp.asarray(w, jnp.float32) ** 2))
            w_eff = w * (g.reshape(shape) / wnorm).astype(w.dtype)
            new_norm = jnp.sqrt(jnp.sum(jnp.asarray(w_eff, jnp.float32) ** 2))
            out = dict(node)
            out["weight"] = w_eff
            out["g"] = jnp.full_like(g, new_norm)
            return out
        return {k: visit(v, path + (k,)) for k, v in node.items()}

    fused = visit(params, ())
    leftover = transpose_set - consumed
    if leftover:
        # a typo'd path would otherwise silently leave its layer unfused
        # (forward still correct, but the caller's intent dropped)
        raise ValueError(f"fuse_wn: transpose_paths not found in the tree: "
                         f"{sorted(leftover)}")
    return fused
