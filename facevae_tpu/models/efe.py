"""EFE — expression feature extractor (active variant: conv5).

One parameterized module covers the reference's EFE_conv/conv2/conv3/conv4/
conv5 family (models.py:297-799); they differ only in block composition:
  conv5: first down block is a SameBlock, last up block is a SameBlock,
         mid_conv reads half the bottleneck channels (the VAE's mu half),
         VAE = flatten_vae_nl.                       (models.py:724-799)
  conv4: all DownBlocks / all UpBlocks, VAE = flatten_vae.  (models.py:648-722)
  conv3: all DownBlocks / all UpBlocks, VAE = local_vae.    (models.py:573-645)
  conv2: no VAE; contrastive features are the raw encoder maps.
                                                     (models.py:371-439)
  conv:  no VAE; contrastive features go through a strided plain-conv
         projection stack (contra_seq, no norm/act between convs — the
         reference stacks bare nn.Conv2d, models.py:329).  (models.py:297-369)

forward(x, x_a, kp_old, train_vae) returns
  (kp [N,K,3], x_c, x_a_c, (mu, logstd), (x_vae, x_hat))
where x_c / x_a_c are bottleneck features of the clean / augmented image for
the contrastive loss (encoder weights shared), and kp is a soft-argmax over a
heatmap mixed with gaussians of the pose-only keypoints kp_old.

The `x_a is None` / `train_vae` branches of the reference (models.py:767-783)
become static Python arguments — each (has_aug, train_vae) combination traces
its own XLA program.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from facevae_tpu.nn import Conv, DownBlock2D, SameBlock2D, SameBlock3D, UpBlock3D, ResBlock3D
from facevae_tpu.models.vae import FlattenVAE_NL, FlattenVAE, LocalVAE
from facevae_tpu.ops.heatmap import out2heatmap_cl, heatmap2kp_cl, kp2gaussian_3d_cl
from facevae_tpu.ops.interpolate import interpolate_bilinear_2d


class _Encoder(nn.Module):
    """Quarter-scale 2D encoder, shared between clean and augmented inputs."""

    variant: str
    down_seq: Sequence[int]
    scale_factor: float
    use_weight_norm: bool
    axis_name: Optional[str]

    @nn.compact
    def __call__(self, x, train: bool = True):
        N, H, W, _ = x.shape
        x = interpolate_bilinear_2d(
            x, (int(H * self.scale_factor), int(W * self.scale_factor)))
        for i in range(len(self.down_seq) - 1):
            if self.variant == "conv5" and i == 0:
                x = SameBlock2D(self.down_seq[i], self.down_seq[i + 1],
                                self.use_weight_norm, axis_name=self.axis_name,
                                name=f"down_{i}")(x, train)
            else:
                x = DownBlock2D(self.down_seq[i], self.down_seq[i + 1],
                                self.use_weight_norm, axis_name=self.axis_name,
                                name=f"down_{i}")(x, train)
        return x


class EFEConv(nn.Module):
    variant: str = "conv5"        # "conv" | "conv2" | "conv3" | "conv4" | "conv5"
    down_seq: Sequence[int] = (3, 32, 64, 128, 256, 32)
    up_seq: Sequence[int] = (256, 256, 128, 64, 32, 32)
    D: int = 16
    K: int = 15
    n_res: int = 3
    scale_factor: float = 0.25
    use_vae: bool = True
    contra_seq: Optional[Sequence[int]] = None   # "conv" only (models.py:306)
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, x_a=None, kp_old=None, train_vae: bool = False,
                 train: bool = True):
        ax = self.axis_name
        encoder = _Encoder(self.variant, self.down_seq, self.scale_factor,
                           self.use_weight_norm, ax, name="down")
        x = encoder(x, train)
        x_z = x
        if x_a is not None:
            x_c = x
            x_a_c = encoder(x_a, train)    # second call on the same module: shared params
            if self.variant == "conv":
                # EFE_conv's contrastive projection: bare strided convs, no
                # norm/act (reference models.py:329,336-342), shared weights
                cseq = self.contra_seq or (self.down_seq[-1], 512, 1024, 2048)
                convs = [Conv(cseq[i + 1], 3, 2, 1, dim=2,
                              name=f"contra_{i}")
                         for i in range(len(cseq) - 1)]

                def project(f):
                    for cv in convs:
                        f = cv(f, train)
                    # torch x_c.view(N,-1) flattens (C,h,w) (models.py:337);
                    # only visible when the projected map is larger than 1x1
                    return f.transpose(0, 3, 1, 2).reshape(f.shape[0], -1)
                x_c, x_a_c = project(x_c), project(x_a_c)
        else:
            x_c, x_a_c = None, None

        mu = logstd = x_vae = x_hat = None
        if self.use_vae and self.variant not in ("conv", "conv2"):
            x_vae = x
            if self.variant == "conv5":
                (mu, logstd), x_hat = FlattenVAE_NL(name="vae")(x, train_vae)
            elif self.variant == "conv4":
                (mu, logstd), x_hat = FlattenVAE(
                    down_seq=(x.shape[1] * x.shape[2] * x.shape[3], 256),
                    name="vae")(x, train_vae)
            else:
                (mu, logstd), x_hat = LocalVAE(name="vae")(x, train, train_vae)
            x_z = x_hat

        x = Conv(self.up_seq[0] * self.D, 1, 1, 0, dim=2, name="mid_conv")(x_z, train)
        n, h, w, _ = x.shape
        x = x.reshape(n, h, w, self.up_seq[0], self.D).transpose(0, 4, 1, 2, 3)
        for i in range(len(self.up_seq) - 1):
            if self.variant == "conv5" and i == len(self.up_seq) - 2:
                x = SameBlock3D(self.up_seq[i], self.up_seq[i + 1],
                                self.use_weight_norm, axis_name=ax,
                                name=f"up_{i}")(x, train)
            else:
                x = UpBlock3D(self.up_seq[i], self.up_seq[i + 1],
                              self.use_weight_norm, axis_name=ax,
                              name=f"up_{i}")(x, train)
        from facevae_tpu.nn.blocks import _s2d_block_ok
        from facevae_tpu.nn.layers import s2d_pack, s2d_unpack
        # the whole tail (out_conv -> gaussian concat -> mix stack) runs
        # packed: out_conv is a bare 3x3x3 conv, the gaussians are packed,
        # and the concat interleaves per phase so channel order matches the
        # unpacked layout exactly
        packed = _s2d_block_ok(x.shape[-1], 2 * self.K, x, self.use_weight_norm)
        if packed:
            xp = s2d_pack(x)
            xp = Conv(self.K, 3, 1, 1, dim=3, s2d_io=True,
                      name="out_conv")(xp, train)               # [..,4K]
            xc = kp2gaussian_3d_cl(kp_old, x.shape[1:4]).astype(xp.dtype)
            xcp = s2d_pack(xc)
            n, d, m, mx, _ = xp.shape
            x = jnp.concatenate([xp.reshape(n, d, m, mx, 4, self.K),
                                 xcp.reshape(n, d, m, mx, 4, self.K)],
                                axis=-1).reshape(n, d, m, mx, 8 * self.K)
        else:
            x = Conv(self.K, 3, 1, 1, dim=3, name="out_conv")(x, train)  # [N,D,h,w,K]
            xc = kp2gaussian_3d_cl(kp_old, x.shape[1:4]).astype(x.dtype)
            x = jnp.concatenate([x, xc], axis=-1)
        for r in range(self.n_res):
            x = ResBlock3D(2 * self.K, self.use_weight_norm, axis_name=ax,
                           s2d_io=packed, name=f"mix_{r}")(x, train)
        if packed:
            x = s2d_unpack(x)
        x = SameBlock3D(2 * self.K, self.K, self.use_weight_norm, axis_name=ax,
                        name="mix_out")(x, train)
        heatmap = out2heatmap_cl(x)
        kp = heatmap2kp_cl(heatmap)
        return kp, x_c, x_a_c, (mu, logstd), (x_vae, x_hat)
