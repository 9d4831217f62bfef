"""Generator (reference models.py:1085-1111).

Warps the appearance volume by the dense deformation (trilinear,
align_corners=True), flattens depth into channels (torch view(N,C*D,H,W):
channel = c*D + d), gates by the occlusion map, then 2D res/up decoding to a
sigmoid RGB image.  use_weight_norm=True -> spectral norm on the block convs
(mid_conv/out_conv are plain convs, as in the reference).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from facevae_tpu.nn import Conv, ConvBlock, ResBlock2D, UpBlock2D, fold_depth
from facevae_tpu.ops.fast_warp import warp_single


def _gen_fold_mode() -> str:
    """How the warped volume reaches in_conv — all three are the same
    function of the SAME checkpoint params (layers.py Conv docs):
      'cmajor'    physical transpose to torch's view(N, C*D, H, W) channels
      'dmajor'    fold_depth transpose + apply-time kernel permute
      'fulldepth' NO fold: full-depth 3D conv on the volume itself
    FACEVAE_GEN_FOLD overrides for A/B; default cmajor (full-step bench
    measured the three within noise — the fold copy is ~0.1% of the step;
    PERF.md round 5)."""
    import os
    return os.environ.get("FACEVAE_GEN_FOLD", "cmajor")


class Generator(nn.Module):
    up_seq: Sequence[int] = (256, 128, 64)
    n_res: int = 6
    D: int = 16
    C: int = 32
    use_weight_norm: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, fs, deformation, occlusion, train: bool = True):
        ax = self.axis_name
        N, D, H, W, C = fs.shape
        # single-grid warp: grouped Pallas path on TPU bf16 (C*W=2048 runs as
        # 8 channel groups sharing each block's one-hot matrices), exact
        # grid_sample on the fp32/fallback path — see ops/fast_warp.warp_single
        fs = warp_single(fs, deformation)
        fs = fs.reshape(N, D, H, W, C).transpose(0, 2, 3, 4, 1).reshape(
            N, H, W, C * D)
        fs = ConvBlock("CNA", C * D, self.up_seq[0], 3, 1, 1, self.use_weight_norm,
                       dim=2, nonlinearity_type="leakyrelu", axis_name=ax,
                       name="in_conv")(fs, train)
        fs = Conv(self.up_seq[0], 1, 1, 0, dim=2, name="mid_conv")(fs, train)
        fs = fs * occlusion
        for i in range(self.n_res):
            fs = ResBlock2D(self.up_seq[0], self.use_weight_norm, axis_name=ax,
                            name=f"res_{i}")(fs, train)
        for i in range(len(self.up_seq) - 1):
            fs = UpBlock2D(self.up_seq[i], self.up_seq[i + 1], self.use_weight_norm,
                           axis_name=ax, name=f"up_{i}")(fs, train)
        fs = Conv(3, 7, 1, 3, dim=2, name="out_conv")(fs, train)
        return nn.sigmoid(fs)
