"""Small runtime utilities."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/facevae_tpu_xla") -> None:
    """Persistent XLA compilation cache: first compiles of the big train step
    are expensive (remote-compile tunnel); later processes reuse them."""
    import jax
    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
