"""NeRF-style positional embedder (reference models.py:32-80).

Used by the reference's linear EFE variants to condition on keypoint
coordinates (models.py:123-127).  Pure function: sin/cos at geometric
frequency bands, optionally including the input.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def get_embedder(multires: int, include_input: bool = True,
                 log_sampling: bool = True, input_dims: int = 3):
    """Returns (embed_fn, out_dim) — reference get_embedder (models.py:72-80)."""
    max_freq = multires - 1
    n_freqs = multires
    if log_sampling:
        freq_bands = 2.0 ** jnp.linspace(0.0, max_freq, n_freqs)
    else:
        freq_bands = jnp.linspace(2.0 ** 0.0, 2.0 ** max_freq, n_freqs)

    out_dim = (input_dims if include_input else 0) + 2 * n_freqs * input_dims

    def embed(x: jnp.ndarray) -> jnp.ndarray:
        parts = [x] if include_input else []
        for f in freq_bands:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim
