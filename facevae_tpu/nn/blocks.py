"""Pattern-string conv blocks mirroring reference modules.py:8-152.

Pattern chars: C = conv (optionally spectral-normed), N = norm (batch /
instance / none), A = nonlinearity (relu / leakyrelu 0.2).  Norm channels
follow the reference rule (modules.py:13): out_channels if C precedes N in
the pattern, else in_channels.

Down/Up/Same/Res blocks are structural: conv + avgpool, nearest-upsample +
conv, 1x1 conv, and pre-activation NAC-NAC residual.  3D variants pool /
upsample only H,W — the depth axis is preserved (modules.py:75,94).
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from facevae_tpu.nn.layers import (Conv, BatchNorm, InstanceNorm,
                                   _s2d_enabled, s2d_pack, s2d_unpack)
from facevae_tpu.ops.interpolate import (
    avg_pool_2d, avg_pool_3d, upsample_nearest_2d, upsample_nearest_3d,
)


def _nonlinearity(kind: str, x):
    if kind == "relu":
        return nn.relu(x)
    if kind == "leakyrelu":
        return nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(kind)


def _s2d_block_ok(in_ch, out_ch, x, use_weight_norm, min_h=32):
    """Space-to-depth packed execution for a whole NAC/CNA chain (2D or 3D):
    worth it for small-channel stacks at real spatial sizes (the per-conv
    variant measured a net LOSS from pack/unpack churn around norm/act —
    whole chains run packed, so boundaries only exist at block edges where
    XLA can cancel adjacent unpack/pack pairs)."""
    H, W = x.shape[-3], x.shape[-2]
    return (_s2d_enabled() and not use_weight_norm
            and in_ch <= 64 and out_ch <= 64 and x.ndim in (4, 5)
            and H >= min_h and H % 2 == 0 and W % 2 == 0)


class ConvBlock(nn.Module):
    """Reference _ConvBlock (modules.py:8-42), dim-generic."""

    pattern: str                      # e.g. "CNA", "NAC", "CN"
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, ...]]
    stride: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    use_weight_norm: bool = False
    dim: int = 2
    norm_type: str = "batch"          # "batch" | "instance" | "none"
    nonlinearity_type: str = "relu"
    axis_name: Optional[str] = None   # SyncBN mesh axis
    # s2d_io: input AND output are space-to-depth packed ([.., 4C] lanes);
    # the conv uses the phase-embedded kernel, BatchNorm reduces over the
    # phase groups.  Param tree identical to the unpacked block (blocks can
    # switch execution per backend without touching checkpoints).
    s2d_io: bool = False
    # Depth-layout passthroughs to Conv (see nn/layers.py Conv).  Both are
    # C-first-pattern only ("CNA"/"CN..."): the norm/activation then see the
    # conv's ordinary 2D output.  Param tree identical to the plain block.
    depth_folded: int = 0
    full_depth_3d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.depth_folded or self.full_depth_3d:
            assert self.pattern.find("C") == 0, \
                "depth-layout conv modes require a C-first pattern"
        c_pos = self.pattern.find("C")
        n_pos = self.pattern.find("N")
        norm_channels = self.out_channels if 0 <= c_pos < n_pos or n_pos < 0 else self.in_channels
        for ch in self.pattern:
            if ch == "C":
                x = Conv(self.out_channels, self.kernel_size, self.stride, self.padding,
                         dim=self.dim, use_spectral_norm=self.use_weight_norm,
                         s2d_io=self.s2d_io, depth_folded=self.depth_folded,
                         full_depth_3d=self.full_depth_3d)(x, train)
            elif ch == "N":
                if self.norm_type == "batch":
                    x = BatchNorm(norm_channels, axis_name=self.axis_name,
                                  lane_groups=4 if self.s2d_io else 1)(x, train)
                elif self.norm_type == "instance":
                    if self.s2d_io:
                        raise ValueError("s2d_io supports batch/none norms only")
                    x = InstanceNorm(norm_channels)(x, train)
                elif self.norm_type != "none":
                    raise ValueError(self.norm_type)
            elif ch == "A":
                x = _nonlinearity(self.nonlinearity_type, x)
            else:
                raise ValueError(ch)
        return x


class DownBlock2D(nn.Module):
    """conv3x3 CNA + avgpool2 (modules.py:59-70)."""

    in_channels: int
    out_channels: int
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if _s2d_block_ok(self.in_channels, self.out_channels, x,
                         self.use_weight_norm):
            xp = ConvBlock("CNA", self.in_channels, self.out_channels, 3, 1, 1,
                           self.use_weight_norm, dim=2,
                           axis_name=self.axis_name, s2d_io=True)(s2d_pack(x), train)
            n, m, mx, c4 = xp.shape
            return xp.reshape(n, m, mx, 4, c4 // 4).mean(3)
        x = ConvBlock("CNA", self.in_channels, self.out_channels, 3, 1, 1,
                      self.use_weight_norm, dim=2, axis_name=self.axis_name)(x, train)
        return avg_pool_2d(x, 2)


class DownBlock3D(nn.Module):
    """conv3x3x3 CNA + avgpool(1,2,2) (modules.py:73-75)."""

    in_channels: int
    out_channels: int
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if _s2d_block_ok(self.in_channels, self.out_channels, x,
                         self.use_weight_norm):
            xp = ConvBlock("CNA", self.in_channels, self.out_channels, 3, 1, 1,
                           self.use_weight_norm, dim=3,
                           axis_name=self.axis_name, s2d_io=True)(s2d_pack(x), train)
            # avgpool(1,2,2) on the unpacked tensor == mean over the 4 phase
            # groups at each packed position (output leaves packed form free)
            n, d, m, mx, c4 = xp.shape
            return xp.reshape(n, d, m, mx, 4, c4 // 4).mean(4)
        x = ConvBlock("CNA", self.in_channels, self.out_channels, 3, 1, 1,
                      self.use_weight_norm, dim=3, axis_name=self.axis_name)(x, train)
        return avg_pool_3d(x, (1, 2, 2))


class UpBlock2D(nn.Module):
    """nearest-upsample2 + conv3x3 CNA (modules.py:78-89)."""

    in_channels: int
    out_channels: int
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if _s2d_block_ok(self.in_channels, self.out_channels, x,
                         self.use_weight_norm, min_h=16):
            xp = jnp.tile(x, (1,) * (x.ndim - 1) + (4,))
            xp = ConvBlock("CNA", self.in_channels, self.out_channels, 3, 1, 1,
                           self.use_weight_norm, dim=2,
                           axis_name=self.axis_name, s2d_io=True)(xp, train)
            return s2d_unpack(xp)
        x = upsample_nearest_2d(x, 2)
        return ConvBlock("CNA", self.in_channels, self.out_channels, 3, 1, 1,
                         self.use_weight_norm, dim=2, axis_name=self.axis_name)(x, train)


class UpBlock3D(nn.Module):
    """nearest-upsample(1,2,2) + conv3x3x3 CNA (modules.py:92-94)."""

    in_channels: int
    out_channels: int
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if _s2d_block_ok(self.in_channels, self.out_channels, x,
                         self.use_weight_norm, min_h=16):
            # packed form of the nearest-(1,2,2)-upsampled tensor at packed
            # spatial == input spatial: all 4 phases equal the source pixel
            xp = jnp.tile(x, (1,) * (x.ndim - 1) + (4,))
            xp = ConvBlock("CNA", self.in_channels, self.out_channels, 3, 1, 1,
                           self.use_weight_norm, dim=3,
                           axis_name=self.axis_name, s2d_io=True)(xp, train)
            return s2d_unpack(xp)
        x = upsample_nearest_3d(x, (1, 2, 2))
        return ConvBlock("CNA", self.in_channels, self.out_channels, 3, 1, 1,
                         self.use_weight_norm, dim=3, axis_name=self.axis_name)(x, train)


class SameBlock2D(nn.Module):
    """1x1 conv CNA (modules.py:97-108)."""

    in_channels: int
    out_channels: int
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return ConvBlock("CNA", self.in_channels, self.out_channels, 1, 1, 0,
                         self.use_weight_norm, dim=2, axis_name=self.axis_name)(x, train)


class SameBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return ConvBlock("CNA", self.in_channels, self.out_channels, 1, 1, 0,
                         self.use_weight_norm, dim=3, axis_name=self.axis_name)(x, train)


class ResBlock2D(nn.Module):
    """pre-activation NAC-NAC residual (modules.py:116-130)."""

    channels: int
    use_weight_norm: bool = False
    axis_name: Optional[str] = None
    s2d_io: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        packed_here = not self.s2d_io and _s2d_block_ok(
            self.channels, self.channels, x, self.use_weight_norm)
        if self.s2d_io or packed_here:
            xp = s2d_pack(x) if packed_here else x
            hp = ConvBlock("NAC", self.channels, self.channels, 3, 1, 1,
                           self.use_weight_norm, dim=2,
                           axis_name=self.axis_name, s2d_io=True)(xp, train)
            hp = ConvBlock("NAC", self.channels, self.channels, 3, 1, 1,
                           self.use_weight_norm, dim=2,
                           axis_name=self.axis_name, s2d_io=True)(hp, train)
            out = xp + hp
            return s2d_unpack(out) if packed_here else out
        h = ConvBlock("NAC", self.channels, self.channels, 3, 1, 1,
                      self.use_weight_norm, dim=2, axis_name=self.axis_name)(x, train)
        h = ConvBlock("NAC", self.channels, self.channels, 3, 1, 1,
                      self.use_weight_norm, dim=2, axis_name=self.axis_name)(h, train)
        return x + h


class ResBlock3D(nn.Module):
    channels: int
    use_weight_norm: bool = False
    axis_name: Optional[str] = None
    # s2d_io: caller threads PACKED tensors through a whole residual STACK
    # (pack once before the loop, unpack after) — per-block pack/unpack
    # boundaries measured ~2.7 ms each at the EFE mix shape
    s2d_io: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        packed_here = not self.s2d_io and _s2d_block_ok(
            self.channels, self.channels, x, self.use_weight_norm)
        if self.s2d_io or packed_here:
            xp = s2d_pack(x) if packed_here else x
            hp = ConvBlock("NAC", self.channels, self.channels, 3, 1, 1,
                           self.use_weight_norm, dim=3,
                           axis_name=self.axis_name, s2d_io=True)(xp, train)
            hp = ConvBlock("NAC", self.channels, self.channels, 3, 1, 1,
                           self.use_weight_norm, dim=3,
                           axis_name=self.axis_name, s2d_io=True)(hp, train)
            out = xp + hp
            return s2d_unpack(out) if packed_here else out
        h = ConvBlock("NAC", self.channels, self.channels, 3, 1, 1,
                      self.use_weight_norm, dim=3, axis_name=self.axis_name)(x, train)
        h = ConvBlock("NAC", self.channels, self.channels, 3, 1, 1,
                      self.use_weight_norm, dim=3, axis_name=self.axis_name)(h, train)
        return x + h


class ResBottleneck(nn.Module):
    """ResNet bottleneck with CN shortcut when shape changes (modules.py:138-152)."""

    in_channels: int
    out_channels: int
    stride: int = 1
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        shortcut = x
        if self.stride != 1 or self.in_channels != self.out_channels:
            shortcut = ConvBlock("CN", self.in_channels, self.out_channels, 1, self.stride, 0,
                                 self.use_weight_norm, dim=2, axis_name=self.axis_name)(x, train)
        h = ConvBlock("CNA", self.in_channels, self.out_channels // 4, 1, 1, 0,
                      self.use_weight_norm, dim=2, axis_name=self.axis_name)(x, train)
        h = ConvBlock("CNA", self.out_channels // 4, self.out_channels // 4, 3, self.stride, 1,
                      self.use_weight_norm, dim=2, axis_name=self.axis_name)(h, train)
        h = ConvBlock("CN", self.out_channels // 4, self.out_channels, 1, 1, 0,
                      self.use_weight_norm, dim=2, axis_name=self.axis_name)(h, train)
        return nn.relu(shortcut + h)
