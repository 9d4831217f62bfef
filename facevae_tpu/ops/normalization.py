"""Input normalization for pretrained perceptual/pose networks.

Parity with /root/reference/utils.py:182-193.  Channel-last layout [N,H,W,3].
"""
from __future__ import annotations

import jax.numpy as jnp

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)
_VGGFACE_MEAN = (129.186279296875, 104.76238250732422, 93.59396362304688)


def apply_imagenet_normalization(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(_IMAGENET_STD, x.dtype)
    return (x - mean) / std


def apply_vggface_normalization(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(_VGGFACE_MEAN, x.dtype)
    return x * 255.0 - mean
