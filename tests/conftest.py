"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the "multi-node without a real cluster" mechanism (SURVEY.md §4):
DP/psum/SyncBN semantics are testable without TPU hardware.  Env vars must be
set before jax initializes.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; force cpu
# through the config API (must happen before any backend is initialized).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the 8-virtual-device train-step/model compiles
# take minutes; repeat test runs hit the cache.
from facevae_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np
import pytest

# Modules whose tests avoid big XLA compiles (pure ops / layer oracles / data
# plumbing): `pytest -m fast` is the <2-minute verify loop.  Everything not
# marked `slow` is the default tier; `slow` adds reference-parity and other
# heavy compiles.
_FAST_MODULES = {
    "test_ops_geometry", "test_ops_sampling", "test_ops_motion_tps",
    "test_nn_layers", "test_elr_conv", "test_wn_layers",
    "test_rotations_embedder", "test_data", "test_load_videos",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
