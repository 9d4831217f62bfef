"""GAN hinge + feature-matching losses (reference losses.py:16-31,154-195)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def gan_loss_dis(dis_output: jnp.ndarray, t_real: bool) -> jnp.ndarray:
    """Hinge loss for the discriminator update (losses.py:172-176).

    real: -mean(min(x-1, 0));  fake: -mean(min(-x-1, 0)).
    """
    x = dis_output.astype(jnp.float32)
    if t_real:
        return -jnp.mean(jnp.minimum(x - 1.0, 0.0))
    return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))


def gan_loss_gen(dis_output: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating generator loss: -mean(D(G)) (losses.py:178)."""
    return -jnp.mean(dis_output.astype(jnp.float32))


def feature_matching_loss(fake_features: Sequence[jnp.ndarray],
                          real_features: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """L1 over discriminator feature maps, target detached.

    Replicates the reference's double-indexing quirk (losses.py:187-195):
    `fake_features[i][j]` iterates j over the BATCH of feature i, so each
    feature contributes (batch_size / num_features) * mean-L1 — i.e. the loss
    scales with batch size.  Kept for loss-curve parity.
    """
    num_d = len(fake_features)
    loss = jnp.asarray(0.0, jnp.float32)
    for f, r in zip(fake_features, real_features):
        n = f.shape[0]
        per = jnp.mean(jnp.abs(f.astype(jnp.float32)
                               - jax.lax.stop_gradient(r).astype(jnp.float32)))
        loss = loss + (n / num_d) * per
    return loss
