"""CKD — canonical keypoint detector (reference models.py:948-987).

Quarter-scale input -> 2D down U-branch -> 1x1 conv to up_seq[0]*D ->
[N,D,h,w,C] volume -> 3D up U-branch -> conv3d to K heatmap channels ->
softmax heatmap -> soft-argmax keypoints [N,K,3].
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn

from facevae_tpu.nn import Conv, DownBlock2D, UpBlock3D
from facevae_tpu.ops.heatmap import out2heatmap_cl, heatmap2kp_cl
from facevae_tpu.ops.interpolate import interpolate_bilinear_2d


class CKD(nn.Module):
    down_seq: Sequence[int] = (3, 64, 128, 256, 512, 1024)
    up_seq: Sequence[int] = (1024, 512, 256, 128, 64, 32)
    D: int = 16
    K: int = 15
    scale_factor: float = 0.25
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        N, H, W, _ = x.shape
        x = interpolate_bilinear_2d(
            x, (int(H * self.scale_factor), int(W * self.scale_factor)))
        for i in range(len(self.down_seq) - 1):
            x = DownBlock2D(self.down_seq[i], self.down_seq[i + 1],
                            self.use_weight_norm, axis_name=ax)(x, train)
        x = Conv(self.up_seq[0] * self.D, 1, 1, 0, dim=2)(x, train)
        n, h, w, _ = x.shape
        x = x.reshape(n, h, w, self.up_seq[0], self.D).transpose(0, 4, 1, 2, 3)
        for i in range(len(self.up_seq) - 1):
            x = UpBlock3D(self.up_seq[i], self.up_seq[i + 1],
                          self.use_weight_norm, axis_name=ax)(x, train)
        x = Conv(self.K, 3, 1, 1, dim=3)(x, train)
        heatmap = out2heatmap_cl(x)
        return heatmap2kp_cl(heatmap)
