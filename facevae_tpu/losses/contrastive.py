"""SimSiam contrastive loss on EFE encoder features
(reference ContrastiveLoss_linear, losses.py:243-278, mode="non-direction").

3-layer MLP projector (Linear-BN-ReLU x2, Linear+BN(affine=False)) and
2-layer predictor; loss = 1 - 0.5*(cos(p1, sg(z2)) + cos(p2, sg(z1))).

The reference SyncBatchNorm-converts this module (trainer.py:261) but gives
its parameters NO optimizer and no DDP wrapper (quirk q7) — they receive
gradients but never update.  Default here mirrors that: the head's params are
kept outside the differentiated/optimized tree (train/step.py);
LossConfig.train_contrastive_head=True opts the head into the generator
optimizer.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from facevae_tpu.nn import Dense, BatchNorm


def _cosine(a, b, eps=1e-8):
    """torch nn.CosineSimilarity(dim=1) parity (fp32)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    num = jnp.sum(a * b, axis=1)
    den = jnp.maximum(jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(b, axis=1), eps)
    return num / den


class _Projector(nn.Module):
    hid_dim: int
    out_dim: int
    axis_name: Optional[str]

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        x = Dense(self.hid_dim, use_bias=False, name="proj_fc1")(x)
        x = BatchNorm(self.hid_dim, axis_name=ax, name="proj_bn1")(x, train)
        x = nn.relu(x)
        x = Dense(self.hid_dim, use_bias=False, name="proj_fc2")(x)
        x = BatchNorm(self.hid_dim, axis_name=ax, name="proj_bn2")(x, train)
        x = nn.relu(x)
        x = Dense(self.out_dim, use_bias=True, name="proj_fc3")(x)
        x = BatchNorm(self.out_dim, axis_name=ax, use_scale_bias=False,
                      name="proj_bn3")(x, train)
        return x


class _Predictor(nn.Module):
    hid_dim: int
    out_dim: int
    axis_name: Optional[str]

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        x = Dense(self.hid_dim, use_bias=False, name="pred_fc1")(x)
        x = BatchNorm(self.hid_dim, axis_name=ax, name="pred_bn1")(x, train)
        x = nn.relu(x)
        return Dense(self.out_dim, name="pred_fc2")(x)


class ContrastiveHead(nn.Module):
    in_dim: int = 512
    hid_dim: int = 512
    out_dim: int = 512
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, f1: jnp.ndarray, f2: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        f1 = f1.reshape(f1.shape[0], -1)
        f2 = f2.reshape(f2.shape[0], -1)
        project = _Projector(self.hid_dim, self.out_dim, self.axis_name, name="projection")
        predict = _Predictor(self.hid_dim, self.out_dim, self.axis_name, name="predictor")
        z1 = project(f1, train)
        z2 = project(f2, train)
        p1 = predict(z1, train)
        p2 = predict(z2, train)
        sg = jax.lax.stop_gradient
        return 1.0 - (_cosine(p1, sg(z2)).mean() + _cosine(p2, sg(z1)).mean()) * 0.5


def contrastive_loss(f1: jnp.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
    """mode="direction" variant: 1 - cos(f1, f2) on raw features
    (losses.py:277)."""
    f1 = f1.reshape(f1.shape[0], -1)
    f2 = f2.reshape(f2.shape[0], -1)
    return 1.0 - _cosine(f1, f2).mean()


class ContrastiveHeadConv(nn.Module):
    """Dormant conv variant (reference ContrastiveLoss_conv, losses.py:281-326)
    in its default mode="direction": a 1x1 conv projects the [N,h,w,C] feature
    maps to 3 channels and the loss is the LPIPS distance between the two
    projections (losses.py:308,323-325).  The LPIPS criterion is a frozen
    module — pass its variables separately (lpips_vars), like the other
    teachers.

    The mode="non-direction" branch is broken upstream (the predictor emits
    out_2_dim=3 channels but is compared against the 128-channel projection
    z2 inside a 3-channel-input LPIPS, losses.py:298,306,318) and is not
    built.
    """

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, f1: jnp.ndarray, f2: jnp.ndarray, lpips_vars,
                 train: bool = True) -> jnp.ndarray:
        from facevae_tpu.nn import Conv
        from facevae_tpu.losses.lpips import LPIPS
        project = Conv(3, 1, 1, 0, dim=2, use_bias=True, name="projection")
        z1 = project(f1, train)
        z2 = project(f2, train)
        return LPIPS().apply(lpips_vars, z1, z2).mean()


class ContrastiveHeadConv2(nn.Module):
    """Dormant conv variant (reference ContrastiveLoss_conv2, losses.py:329-382,
    mode="non-direction"): strided conv+BN(affine=False) projector on [N,h,w,C]
    feature maps, 2-layer MLP predictor, symmetric negative-cosine.
    """

    in_dim: int = 256
    out_dim: int = 128
    dim_linear: int = 512
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, f1: jnp.ndarray, f2: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        from facevae_tpu.nn import Conv
        ax = self.axis_name
        proj_conv = Conv(self.out_dim, 3, 2, 1, dim=2, use_bias=True, name="proj_conv")
        proj_bn = BatchNorm(self.out_dim, axis_name=ax, use_scale_bias=False,
                            name="proj_bn")
        predict = _Predictor(self.dim_linear, self.dim_linear, ax, name="predictor")

        def project(f):
            z = proj_bn(proj_conv(f, train), train)
            # torch z.view(N,-1) flattens (C,H,W)-order (losses.py:366) — the
            # predictor's ported linear weights expect that order
            return z.transpose(0, 3, 1, 2).reshape(z.shape[0], -1)

        z1, z2 = project(f1), project(f2)
        p1, p2 = predict(z1, train), predict(z2, train)
        sg = jax.lax.stop_gradient
        return 1.0 - (_cosine(p1, sg(z2)).mean() + _cosine(p2, sg(z1)).mean()) * 0.5
