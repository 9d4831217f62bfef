"""Rotation representations (reference models_utils.py:837-930).

Rodrigues / quaternion / axis-angle conversions and rotation interpolation.
Dormant in the reference's active path (vendored Meta code used by the ELR
variants) but part of the public surface; re-derived here as pure jnp.
"""
from __future__ import annotations

import jax.numpy as jnp


def rodrigues(rvec: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle vectors [N,3] -> rotation matrices [N,3,3]."""
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)           # [N,1]
    axis = rvec / jnp.maximum(theta, eps)
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([zero, -z, y,
                   z, zero, -x,
                   -y, x, zero], axis=-1).reshape(-1, 3, 3)
    t = theta[..., None]
    eye = jnp.eye(3, dtype=rvec.dtype)
    R = eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)
    # theta ~ 0: R -> I + K*theta (first order); the formula handles it since
    # sin(t)~t and (1-cos)~0, with axis guarded by eps.
    return R


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions [N,4] (w,x,y,z) -> rotation matrices [N,3,3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(-1, 3, 3)


def matrix_to_quaternion(R: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """[N,3,3] -> unit quaternions [N,4] (w,x,y,z), w >= 0."""
    m00, m11, m22 = R[:, 0, 0], R[:, 1, 1], R[:, 2, 2]
    w = jnp.sqrt(jnp.maximum(1.0 + m00 + m11 + m22, eps)) / 2.0
    w4 = jnp.maximum(4.0 * w, eps)
    x = (R[:, 2, 1] - R[:, 1, 2]) / w4
    y = (R[:, 0, 2] - R[:, 2, 0]) / w4
    z = (R[:, 1, 0] - R[:, 0, 1]) / w4
    q = jnp.stack([w, x, y, z], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def matrix_to_axisangle(R: jnp.ndarray, eps: float = 1e-8):
    """[N,3,3] -> (axis [N,3], angle [N]).  Reference models_utils.py:893-903."""
    angle = jnp.arccos(jnp.clip((R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2] - 1.0) / 2.0,
                                -1.0, 1.0))
    vec = jnp.stack([R[:, 2, 1] - R[:, 1, 2],
                     R[:, 0, 2] - R[:, 2, 0],
                     R[:, 1, 0] - R[:, 0, 1]], axis=-1)
    axis = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), eps)
    return axis, angle


def axisangle_to_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """(axis [N,3], angle [N]) -> [N,3,3] (reference models_utils.py:906-917)."""
    return rodrigues(axis * angle[:, None])


def rotation_interp(R0: jnp.ndarray, R1: jnp.ndarray, alpha) -> jnp.ndarray:
    """Geodesic interpolation between rotation matrices
    (reference models_utils.py:920-930): slerp via the relative axis-angle."""
    rel = jnp.matmul(R1, jnp.swapaxes(R0, -1, -2))
    axis, angle = matrix_to_axisangle(rel)
    return jnp.matmul(axisangle_to_matrix(axis, angle * alpha), R0)
