"""Rotation-representation helpers + NeRF embedder."""
import numpy as np
import jax.numpy as jnp

from facevae_tpu.ops.rotations import (
    rodrigues, quaternion_to_matrix, matrix_to_quaternion,
    matrix_to_axisangle, axisangle_to_matrix, rotation_interp,
)
from facevae_tpu.models.embedder import get_embedder


def _random_rotations(rng, n):
    q, _ = np.linalg.qr(rng.randn(n, 3, 3))
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q.astype(np.float32)


def test_rodrigues_roundtrip(rng):
    R = _random_rotations(rng, 4)
    axis, angle = matrix_to_axisangle(jnp.asarray(R))
    R2 = axisangle_to_matrix(axis, angle)
    np.testing.assert_allclose(np.asarray(R2), R, rtol=1e-4, atol=1e-5)


def test_quaternion_roundtrip(rng):
    R = _random_rotations(rng, 4)
    q = matrix_to_quaternion(jnp.asarray(R))
    R2 = quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), R, rtol=1e-4, atol=1e-5)


def test_rotation_interp_endpoints_and_validity(rng):
    R0 = _random_rotations(rng, 3)
    R1 = _random_rotations(rng, 3)
    np.testing.assert_allclose(np.asarray(rotation_interp(jnp.asarray(R0), jnp.asarray(R1), 0.0)),
                               R0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rotation_interp(jnp.asarray(R0), jnp.asarray(R1), 1.0)),
                               R1, atol=1e-4)
    Rh = np.asarray(rotation_interp(jnp.asarray(R0), jnp.asarray(R1), 0.5))
    np.testing.assert_allclose(Rh @ np.transpose(Rh, (0, 2, 1)),
                               np.broadcast_to(np.eye(3, dtype=np.float32), Rh.shape),
                               atol=1e-5)


def test_embedder(rng):
    embed, out_dim = get_embedder(multires=4, input_dims=3)
    x = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    y = embed(x)
    assert y.shape == (5, out_dim)
    assert out_dim == 3 + 2 * 4 * 3
    np.testing.assert_allclose(np.asarray(y[:, :3]), np.asarray(x), rtol=1e-6)
