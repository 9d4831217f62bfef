"""AFE — 3D appearance feature extractor (reference models.py:922-945).

[N,H,W,3] -> 7x7 conv -> 2 DownBlocks -> 1x1 conv to C*D -> reshape to a
[N,D,H/4,W/4,C] volume -> n_res ResBlock3D.

The torch view(N,C,D,H,W) from (N,C*D,H,W) maps conv channel k to
(c=k//D, d=k%D); the channel-last reshape below preserves that layout so
torch checkpoints port exactly.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn

from facevae_tpu.nn import Conv, ConvBlock, DownBlock2D, ResBlock3D
from facevae_tpu.nn.blocks import _s2d_block_ok
from facevae_tpu.nn.layers import s2d_pack, s2d_unpack


class AFE(nn.Module):
    down_seq: Sequence[int] = (64, 128, 256)
    n_res: int = 6
    C: int = 32
    D: int = 16
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        x = ConvBlock("CNA", 3, self.down_seq[0], 7, 1, 3, self.use_weight_norm,
                      dim=2, axis_name=ax)(x, train)
        for i in range(len(self.down_seq) - 1):
            x = DownBlock2D(self.down_seq[i], self.down_seq[i + 1],
                            self.use_weight_norm, axis_name=ax)(x, train)
        x = Conv(self.C * self.D, 1, 1, 0, dim=2)(x, train)
        N, H, W, _ = x.shape
        # channel k -> (c = k // D, d = k % D): split last dim as (C, D), then
        # move depth in front of the spatial dims.
        x = x.reshape(N, H, W, self.C, self.D).transpose(0, 4, 1, 2, 3)
        # pack ONCE around the whole residual stack (per-block boundaries
        # cost ~2.7 ms each; see nn/blocks.py ResBlock3D.s2d_io)
        packed = _s2d_block_ok(self.C, self.C, x, self.use_weight_norm)
        if packed:
            x = s2d_pack(x)
        for _ in range(self.n_res):
            x = ResBlock3D(self.C, self.use_weight_norm, axis_name=ax,
                           s2d_io=packed)(x, train)
        return s2d_unpack(x) if packed else x
