"""torch-default parameter initializers.

torch nn.Conv2d/3d and nn.Linear initialize with kaiming_uniform(a=sqrt(5)),
which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); biases are
U(-1/sqrt(fan_in), 1/sqrt(fan_in)).  Matching the init distribution keeps
fresh-init loss curves statistically comparable to the reference
(BASELINE.md add.txt epoch-0 anchors).
"""
from __future__ import annotations

import numpy as np
import jax


def torch_kernel_init(fan_in: int):
    """Init for conv kernels (HWIO/DHWIO) and dense kernels (in,out)."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jax.numpy.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jax.numpy.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
