"""VAE bottlenecks for the expression feature extractor.

Active: FlattenVAE_NL (reference flatten_vae_nl, models.py:525-570) — a
parameter-free channel-split VAE: mu = first half of channels, logstd =
second half (zeroed unless train_vae), z = mu + exp(logstd)*eps (noise also
zeroed unless train_vae; quirk q8).

Dormant variants kept as configs: FlattenVAE (models.py:484-522, ELR encoder
with mu/logstd heads) and LocalVAE (models.py:442-482, conv encoder/decoder —
its reference forward has the VAE core commented out; parity keeps the same
passthrough behavior).

Noise comes from the 'noise' PRNG stream (the reference draws torch.randn
inside forward, models.py:561 — here RNG is explicit so steps stay pure).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from facevae_tpu.nn import DownBlock2D, UpBlock2D, LinearELR


class FlattenVAE_NL(nn.Module):
    """Parameter-free channel-split VAE.  x: [N,h,w,2*Cz] channel-last."""

    @nn.compact
    def __call__(self, x, train_vae: bool = False):
        N = x.shape[0]
        half = x.shape[-1] // 2
        mu = x[..., :half].reshape(N, -1)
        if train_vae:
            logstd = x[..., half:].reshape(N, -1)
            eps = jax.random.normal(self.make_rng("noise"), logstd.shape, logstd.dtype)
            z = mu + jnp.exp(logstd) * eps
            x_hat = z.reshape(x.shape[:-1] + (half,))
            return (mu, logstd), x_hat
        x_hat = mu.reshape(x.shape[:-1] + (half,))
        return (None, None), x_hat


class FlattenVAE(nn.Module):
    """ELR-encoder VAE over flattened features (reference flatten_vae)."""

    down_seq: Sequence[int] = (16 * 4 * 4, 256)
    vae_seq: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, x, train_vae: bool = False):
        N, hh, ww, C = x.shape
        # torch (C,H,W)-order flatten (models.py:511); see FlattenVAE6
        h = x.transpose(0, 3, 1, 2).reshape(N, -1)
        for i in range(len(self.down_seq) - 1):
            h = LinearELR(self.down_seq[i], self.down_seq[i + 1],
                          norm="demod", act="leakyrelu")(h)
        mu = LinearELR(self.vae_seq[0], self.vae_seq[1], name="mu_fc")(h) * 0.1

        def unflatten(z):
            return z.reshape(N, C, hh, ww).transpose(0, 2, 3, 1)

        if train_vae:
            logstd = LinearELR(self.vae_seq[0], self.vae_seq[1], name="logstd_fc")(h) * 0.01
            eps = jax.random.normal(self.make_rng("noise"), logstd.shape, logstd.dtype)
            z = mu + jnp.exp(logstd) * eps
            return (mu, logstd), unflatten(z)
        # reference zeroes logstd AND noise when not train_vae -> z = mu
        LinearELR(self.vae_seq[0], self.vae_seq[1], name="logstd_fc")(h)  # keep params
        return (None, None), unflatten(mu)


class FlattenVAE6(nn.Module):
    """ELR encoder/decoder VAE (reference flatten_vae6, models.py:802-833):
    always returns (mu, logstd, x_hat); samples when train_vae."""

    down_seq: Sequence[int] = (16 * 4 * 4, 256)
    up_seq: Sequence[int] = (256, 16 * 4 * 4)
    vae_seq: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, x, train_vae: bool = True):
        shape = x.shape
        N, hh, ww, C = shape
        # torch flattens (C,H,W)-order (models.py:824 x.flatten(start_dim=1)
        # on NCHW); match it so ported linear weights line up at spatial > 1x1
        h = x.transpose(0, 3, 1, 2).reshape(N, -1)
        for i in range(len(self.down_seq) - 1):
            h = LinearELR(self.down_seq[i], self.down_seq[i + 1],
                          norm="demod", act="leakyrelu", name=f"enc_{i}")(h)
        mu = LinearELR(self.vae_seq[0], self.vae_seq[1], name="mu_fc")(h) * 0.1
        logstd = LinearELR(self.vae_seq[0], self.vae_seq[1], name="logstd_fc")(h) * 0.01
        if train_vae:
            eps = jax.random.normal(self.make_rng("noise"), logstd.shape, logstd.dtype)
            z = mu + jnp.exp(logstd) * eps
        else:
            z = mu
        for i in range(len(self.up_seq) - 1):
            z = LinearELR(self.up_seq[i], self.up_seq[i + 1],
                          norm="demod", act="leakyrelu", name=f"dec_{i}")(z)
        return (mu, logstd), z.reshape(N, C, hh, ww).transpose(0, 2, 3, 1)


class LocalVAE(nn.Module):
    """Conv encoder/decoder passthrough (reference local_vae: VAE core is
    commented out upstream; forward is encoder -> fc -> fc -> decoder)."""

    down_seq: Sequence[int] = (128, 128)
    up_seq: Sequence[int] = (128, 128)
    vae_seq: Sequence[int] = (512, 256)
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, train_vae: bool = False):
        N = x.shape[0]
        h = x
        for i in range(len(self.down_seq) - 1):
            h = DownBlock2D(self.down_seq[i], self.down_seq[i + 1],
                            self.use_weight_norm, axis_name=self.axis_name)(h, train)
        # torch (C,H,W)-order flatten/unflatten (models.py:475,479)
        flat = h.transpose(0, 3, 1, 2).reshape(N, -1)
        flat = LinearELR(flat.shape[-1], self.vae_seq[0], norm="demod",
                         act="leakyrelu", name="map_fc1")(flat)
        flat = LinearELR(self.vae_seq[0], 128 * 4 * 4, norm="demod",
                         act="leakyrelu", name="map_fc2")(flat)
        h = flat.reshape(N, self.up_seq[0], 4, 4).transpose(0, 2, 3, 1)
        for i in range(len(self.up_seq) - 1):
            h = UpBlock2D(self.up_seq[i], self.up_seq[i + 1],
                          self.use_weight_norm, axis_name=self.axis_name)(h, train)
        return (None, None), h
