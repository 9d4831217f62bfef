"""EFE_conv6 — the ELR/pyramid expression extractor variant
(reference models.py:836-920).

Conv2dELR encoder (demod + leakyrelu, the reference's quirky k1-s1-p1 stem),
flatten_vae6 bottleneck, and a decoder whose transposed-conv stages double
BOTH depth and spatial size (16,4,4 -> 256,64,64) with skip-ADDS from a
keypoint-gaussian feature pyramid (the reference renders the kp gaussians at
a hardcoded (256,64,64) volume, models.py:906).

Only valid for 256² inputs (the reference hardcodes the pyramid shapes);
enforced at call time.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from facevae_tpu.nn import Conv, Conv2dELR, ConvBlock, SameBlock3D, UpSampleBlock3d
from facevae_tpu.models.vae import FlattenVAE6
from facevae_tpu.ops.heatmap import out2heatmap_cl, heatmap2kp_cl, kp2gaussian_3d_cl
from facevae_tpu.ops.interpolate import interpolate_bilinear_2d


class _ELREncoder(nn.Module):
    use_demod: bool = True

    @nn.compact
    def __call__(self, x):
        norm = "demod" if self.use_demod else None
        down_seq = (3, 32, 64, 128, 256, 16)
        x = Conv2dELR(down_seq[0], down_seq[1], 1, 1, 1, norm=norm,
                      act="leakyrelu", name="enc_0")(x)
        for i in range(1, 5):
            x = Conv2dELR(down_seq[i], down_seq[i + 1], 4, 2, 1, norm=norm,
                          act="leakyrelu", name=f"enc_{i}")(x)
        return x


class EFEConv6(nn.Module):
    D: int = 16
    K: int = 15
    scale_factor: float = 0.25
    use_vae: bool = True
    use_weight_norm: bool = False
    demod: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, x_a=None, kp_old=None, train_vae: bool = False,
                 train: bool = True):
        if x.shape[1] != 256:
            raise ValueError("EFE_conv6 hardcodes 256² shapes (reference "
                             "models.py:906); got " + str(x.shape))
        ax = self.axis_name
        N, H, W, _ = x.shape
        enc = _ELREncoder(self.demod, name="efe_encoder")
        xs = interpolate_bilinear_2d(x, (int(H * self.scale_factor),
                                         int(W * self.scale_factor)))
        h = enc(xs)                                       # [N,4,4,16]
        x_z = h
        if x_a is not None:
            x_c = h
            xa = interpolate_bilinear_2d(x_a, (int(H * self.scale_factor),
                                               int(W * self.scale_factor)))
            x_a_c = enc(xa)
        else:
            x_c, x_a_c = None, None

        mu = logstd = x_vae = x_hat = None
        if self.use_vae:
            x_vae = h
            (mu, logstd), x_hat = FlattenVAE6(name="vae")(h, train_vae)
            x_z = x_hat

        up_seq = (256, 128, 128, 64, 32, self.K)
        h = Conv(up_seq[0] * self.D, 1, 1, 0, dim=2, name="mid_conv")(x_z, train)
        n, hh, ww, _ = h.shape
        h = h.reshape(n, hh, ww, up_seq[0], self.D).transpose(0, 4, 1, 2, 3)

        # keypoint-gaussian feature pyramid (reference hardcodes (256,64,64))
        xc = kp2gaussian_3d_cl(kp_old, (256, 64, 64)).astype(h.dtype)
        down_kpc = (self.K, 32, 64, 128, 128)
        xc64 = ConvBlock("CNA", down_kpc[0], down_kpc[1], 1, 1, 0,
                         self.use_weight_norm, dim=3, nonlinearity_type="leakyrelu",
                         axis_name=ax, name="kpc_64")(xc, train)
        xc32 = ConvBlock("CNA", down_kpc[1], down_kpc[2], 4, 2, 1,
                         self.use_weight_norm, dim=3, nonlinearity_type="leakyrelu",
                         axis_name=ax, name="kpc_32")(xc64, train)
        xc16 = ConvBlock("CNA", down_kpc[2], down_kpc[3], 4, 2, 1,
                         self.use_weight_norm, dim=3, nonlinearity_type="leakyrelu",
                         axis_name=ax, name="kpc_16")(xc32, train)
        xc8 = ConvBlock("CNA", down_kpc[3], down_kpc[4], 4, 2, 1,
                        self.use_weight_norm, dim=3, nonlinearity_type="leakyrelu",
                        axis_name=ax, name="kpc_8")(xc16, train)

        h = UpSampleBlock3d(up_seq[0], up_seq[1], name="dec_8")(h, xc8)
        h = UpSampleBlock3d(up_seq[1], up_seq[2], name="dec_16")(h, xc16)
        h = UpSampleBlock3d(up_seq[2], up_seq[3], name="dec_32")(h, xc32)
        h = UpSampleBlock3d(up_seq[3], up_seq[4], name="dec_64")(h, xc64)
        h = SameBlock3D(up_seq[4], up_seq[5], self.use_weight_norm,
                        axis_name=ax, name="efe_out")(h, train)

        heatmap = out2heatmap_cl(h)
        kp = heatmap2kp_cl(heatmap)
        return kp, x_c, x_a_c, (mu, logstd), (x_vae, x_hat)
