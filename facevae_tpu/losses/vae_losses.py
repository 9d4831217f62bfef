"""VAE losses (reference losses.py:385-403)."""
from __future__ import annotations

import jax.numpy as jnp


def kl_divergence_loss(mu: jnp.ndarray, logstd: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mu, exp(logstd)) || N(0,1)), mean over dims then batch
    (losses.py:385-393)."""
    mu = mu.astype(jnp.float32)
    logstd = logstd.astype(jnp.float32)
    kl = -0.5 - logstd + 0.5 * mu ** 2 + 0.5 * jnp.exp(2.0 * logstd)
    return kl.mean(axis=-1).mean()


def recon_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """MSE (losses.py:396-403).  Active path feeds (d, generated_d),
    trainer.py:314."""
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
