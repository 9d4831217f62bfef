"""Keypoint-space and pose losses (reference losses.py:198-240)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def equivariance_loss(kp_d: jnp.ndarray, reverse_kp: jnp.ndarray) -> jnp.ndarray:
    """L1 between (x,y) of driving kp and TPS-inverse-warped kp (losses.py:198-205)."""
    return jnp.mean(jnp.abs(kp_d[:, :, :2] - reverse_kp))


def keypoint_prior_loss(kp_d: jnp.ndarray, Dt: float = 0.1, zt: float = 0.33) -> jnp.ndarray:
    """Pairwise-distance hinge + mean-depth anchor (losses.py:208-221).

    hinge on squared euclidean distances (torch.cdist(...)^2... the reference
    squares cdist, i.e. uses squared distances).
    """
    diff = kp_d[:, :, None, :] - kp_d[:, None, :, :]
    dist_sq = jnp.sum(diff * diff, axis=-1)                    # [N,K,K]
    hinge = jnp.maximum(0.0, Dt - dist_sq).sum(axis=(1, 2)).mean()
    depth = jnp.abs(kp_d[:, :, 2].mean(axis=1) - zt).mean()
    return hinge + depth - kp_d.shape[1] * Dt


def headpose_loss(yaw, pitch, roll, real_yaw, real_pitch, real_roll) -> jnp.ndarray:
    """L1 vs frozen Hopenet angles, /3, in degrees (losses.py:224-231)."""
    sg = jax.lax.stop_gradient
    loss = (jnp.mean(jnp.abs(yaw - sg(real_yaw)))
            + jnp.mean(jnp.abs(pitch - sg(real_pitch)))
            + jnp.mean(jnp.abs(roll - sg(real_roll)))) / 3.0
    return loss / math.pi * 180.0


def deformation_prior_loss(delta_d: jnp.ndarray) -> jnp.ndarray:
    """mean |delta| (losses.py:234-240).  The active path feeds kp_d_old - kp_d
    (quirk q11, trainer.py:308)."""
    return jnp.mean(jnp.abs(delta_d))
