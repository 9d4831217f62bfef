"""Core layers: Conv (2D/3D, optional spectral norm), Dense, BatchNorm
(optionally cross-device synced), InstanceNorm.

BatchNorm is the SyncBatchNorm replacement: the reference converts every BN
to nn.SyncBatchNorm (logger.py:55-58; default norm in conv blocks,
modules.py:19), an all-reduce of batch statistics across ranks.  Here batch
mean / mean-of-squares are `lax.pmean`'d over the mesh axis named by
``axis_name`` — exactness matters for loss-curve parity (SURVEY.md §2.5).

Spectral norm (used when use_weight_norm=True: Generator/Discriminator,
reference models.py:1093,1117 via modules.py:14) runs one power iteration per
training call, u persisted in the 'spectral' collection.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from facevae_tpu.nn.init import torch_kernel_init, torch_bias_init


def _l2norm(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class Conv(nn.Module):
    """Channel-last convolution (dim=2 -> NHWC, dim=3 -> NDHWC).

    torch-default init; optional spectral normalization of the kernel
    (torch.nn.utils.spectral_norm semantics: one power iteration per training
    forward, weight divided by sigma).
    """

    features: int
    kernel_size: Union[int, Tuple[int, ...]]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    dim: int = 2
    use_bias: bool = True
    use_spectral_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dim
        ks = (self.kernel_size,) * d if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        st = (self.strides,) * d if isinstance(self.strides, int) else tuple(self.strides)
        pd = (self.padding,) * d if isinstance(self.padding, int) else tuple(self.padding)
        in_features = x.shape[-1]
        fan_in = in_features
        for k in ks:
            fan_in *= int(k)

        kernel = self.param("kernel", torch_kernel_init(fan_in), ks + (in_features, self.features))

        if self.use_spectral_norm:
            # u in out-channel space, v in flattened-input space (torch layout).
            fan_total = fan_in

            def u_init():
                return _l2norm(jax.random.normal(self.make_rng("params"), (self.features,)))

            def v_init():
                return _l2norm(jax.random.normal(self.make_rng("params"), (fan_total,)))

            u_var = self.variable("spectral", "u", u_init)
            v_var = self.variable("spectral", "v", v_init)
            w_mat = kernel.reshape(-1, self.features).T          # (out, fan_in_total)
            u, v = u_var.value, v_var.value
            if train and not self.is_initializing():
                # one power iteration per training forward (torch semantics)
                sg = jax.lax.stop_gradient(w_mat)
                v = _l2norm(sg.T @ u)
                u = _l2norm(sg @ v)
                u_var.value, v_var.value = u, v
            sigma = jnp.einsum("i,ij,j->", jax.lax.stop_gradient(u), w_mat,
                               jax.lax.stop_gradient(v))
            kernel = kernel / sigma

        dn_spatial = "DHW"[3 - d:] if d < 3 else "DHW"
        lhs_spec = "N" + dn_spatial + "C"
        rhs_spec = dn_spatial + "IO"
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, (lhs_spec, rhs_spec, lhs_spec))
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=st,
            padding=[(p, p) for p in pd],
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module):
    """torch nn.Linear parity (kernel stored (in,out))."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init(in_features), (in_features, self.features))
        dtype = self.dtype or x.dtype
        y = jnp.matmul(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_features), (self.features,))
            y = y + bias.astype(dtype)
        return y


class BatchNorm(nn.Module):
    """torch (Sync)BatchNorm parity, channel-last.

    train: normalize by biased batch variance; update running stats with
    unbiased variance and momentum 0.1 (torch convention:
    new = (1-m)*old + m*batch).  With axis_name set, batch statistics are
    pmean'd over that mesh axis (SyncBatchNorm).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    use_scale_bias: bool = True   # torch affine=True

    @nn.compact
    def __call__(self, x, train: bool = True):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda *_: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda *_: jnp.ones((self.features,), jnp.float32))
        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            mean = xf.mean(reduce_axes)
            mean2 = (xf * xf).mean(reduce_axes)
            # axis is only bound inside shard_map/pmap; init traces run outside
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - mean * mean
            if not self.is_initializing():
                n = 1
                for a in reduce_axes:
                    n *= x.shape[a]
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                n = jnp.asarray(n, jnp.float32)
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + bias
        return y.astype(x.dtype)


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d/3d(affine=True) parity: per-sample per-channel
    normalization over spatial dims, no running stats."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        spatial_axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = xf.mean(spatial_axes, keepdims=True)
        var = xf.var(spatial_axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (y * scale + bias).astype(x.dtype)
