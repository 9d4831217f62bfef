"""EFE linear variants (reference EFE_linear models.py:189-295 and
EFE_lin_conv models.py:82-187).

Fully-linear expression extractors: a 2D conv encoder collapses the frame to
a single feature vector, which is mapped through equalized-LR (demodulated)
linear layers, concatenated with a NeRF positional embedding of the pose-only
keypoints (get_embedder(10) -> 63 dims/kp, models.py:123-127,163-165), and
decoded straight to K*3 tanh'd keypoint coordinates (no heatmap).

Reference quirks preserved / repaired:
  - q2: EFE_linear hard-disables its contrastive branch (`x_a = None`,
    models.py:253) -> variant "linear" always returns x_c = x_a_c = None.
  - EFE_lin_conv is BROKEN upstream: its `encoder()` closure never assigns
    `self.down` (models.py:117-118), its VAE reads `x_c`, which is None
    whenever x_a is None (models.py:152-153), and the augmented branch skips
    the quarter-scale interpolate (models.py:148) so x_a_c keeps 4x4 spatial
    and would crash the 2048-wide contrastive head.  This implementation
    builds the evident intent: the down chain exists, the VAE reads the
    (always available) encoder features, and both branches share the scaled
    encoder.  Golden vs the minimally-patched reference in
    tests/test_variant_golden.py (both breakages pinned there).
  - The reference lin_conv forward always samples the reparameterization
    noise; here sampling is gated on `train_vae` like the conv family
    (deterministic-mu mode by default, quirk q8) so the variant composes with
    the shared objective.

forward(x, x_a, kp_old, train_vae, train) returns the family-wide 5-tuple
  (kp [N,K,3], x_c, x_a_c, (mu, logstd), (x_vae, x_hat)).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from facevae_tpu.nn import DownBlock2D, LinearELR
from facevae_tpu.models.embedder import get_embedder
from facevae_tpu.ops.interpolate import interpolate_bilinear_2d


class _FlatEncoder(nn.Module):
    """Quarter-scale DownBlock2D chain collapsed to a flat feature vector."""

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
            x = DownBlock2D(self.down_seq[i], self.down_seq[i + 1],
                            self.use_weight_norm, axis_name=self.axis_name,
                            name=f"down_{i}")(x, train)
        return x.reshape(N, -1)           # [N, C * h * w]; 1x1 spatial at 256²


class EFELinear(nn.Module):
    variant: str = "linear"                # "linear" | "lin_conv"
    down_seq: Sequence[int] = (3, 64, 128, 256, 512, 1024, 2048)
    vae_seq: Optional[Sequence[int]] = None          # lin_conv: (2048, 4096, 4096)
    mid_seq: Sequence[int] = (2048, 512)             # lin_conv: (2048, 2048)
    cat_seq: Sequence[int] = (512, 512)              # lin_conv: (2048, 2048)
    up_seq: Sequence[int] = (512, 512)               # lin_conv: (2048,)*4
    K: int = 15
    multires: int = 10
    scale_factor: float = 0.25
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, x_a=None, kp_old=None, train_vae: bool = False,
                 train: bool = True):
        encoder = _FlatEncoder(self.down_seq, self.scale_factor,
                               self.use_weight_norm, self.axis_name, name="down")
        feat = encoder(x, train)
        x_z = feat

        if self.variant == "linear" or x_a is None:   # quirk q2 for "linear"
            x_c, x_a_c = None, None
        else:
            x_c = feat
            x_a_c = encoder(x_a, train)

        mu = logstd = None
        if self.vae_seq is not None:
            h = feat
            for i in range(len(self.vae_seq) - 1):
                h = LinearELR(self.vae_seq[i], self.vae_seq[i + 1],
                              norm="demod", act="leakyrelu",
                              name=f"vae_enc_{i}")(h)
            mu = LinearELR(self.vae_seq[-1], self.vae_seq[-1] // 2, name="mu")(h)
            logstd = LinearELR(self.vae_seq[-1], self.vae_seq[-1] // 2,
                               name="logstd")(h)
            if train_vae:
                eps = jax.random.normal(self.make_rng("noise"), logstd.shape,
                                        logstd.dtype)
                x_z = mu + jnp.exp(logstd) * eps
            else:
                x_z = mu                    # deterministic-mu mode (quirk q8)

        h = x_z
        for i in range(len(self.mid_seq) - 1):
            h = LinearELR(self.mid_seq[i], self.mid_seq[i + 1], norm="demod",
                          act="leakyrelu", name=f"mid_map_{i}")(h)

        embed, per_kp = get_embedder(self.multires)
        kp_emb = embed(kp_old).reshape(h.shape[0], self.K * per_kp)
        h = jnp.concatenate([h, kp_emb.astype(h.dtype)], axis=1)
        for i in range(len(self.cat_seq) - 1):
            d_in = self.cat_seq[i] + (self.K * per_kp if i == 0 else 0)
            h = LinearELR(d_in, self.cat_seq[i + 1], norm="demod",
                          act="leakyrelu", name=f"mid_cat_{i}")(h)

        for i in range(len(self.up_seq) - 1):
            h = LinearELR(self.up_seq[i], self.up_seq[i + 1], norm="demod",
                          act="leakyrelu", name=f"up_{i}")(h)
        h = LinearELR(self.up_seq[-1], self.K * 3, name="final_linear")(h)
        kp = jnp.tanh(h).reshape(-1, self.K, 3)
        return kp, x_c, x_a_c, (mu, logstd), (None, None)


def efe_lin_conv_defaults():
    """Reference EFE_lin_conv ctor defaults (models.py:88-92)."""
    return dict(variant="lin_conv",
                down_seq=(3, 64, 128, 256, 512, 1024, 2048),
                vae_seq=(2048, 4096, 4096),
                mid_seq=(2048, 2048), cat_seq=(2048, 2048),
                up_seq=(2048, 2048, 2048, 2048))
