"""Keypoint geometry: rotation matrices, pose transforms, coordinate grids.

Semantics match /root/reference/utils.py:5-103 (behavioral parity, not a
translation): kp = R(yaw,pitch,roll) @ (scale * kp_canonical) + t, with the
reference's axis convention — coordinates are ordered (x=W, y=H, z=D) and
normalized to [-1, 1], matching grid_sample's grid layout.

Everything here is shape-static and device-agnostic (the reference hardcodes
.cuda() in grid creation, utils.py:82-83,94-95 — quirk q6).
"""
from __future__ import annotations

import jax.numpy as jnp


def rotation_matrix_x(theta: jnp.ndarray) -> jnp.ndarray:
    """[N] -> [N,3,3].  Matches reference utils.py:5-18 row layout:
    [[c,0,s],[0,1,0],[-s,0,c]] (a rotation mixing the x/z grid axes)."""
    theta = theta.reshape(-1)
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(theta), jnp.ones_like(theta)
    rows = jnp.stack(
        [c, z, s,
         z, o, z,
         -s, z, c], axis=-1)
    return rows.reshape(-1, 3, 3)


def rotation_matrix_y(theta: jnp.ndarray) -> jnp.ndarray:
    """[N] -> [N,3,3].  Reference utils.py:21-34: [[1,0,0],[0,c,-s],[0,s,c]]."""
    theta = theta.reshape(-1)
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(theta), jnp.ones_like(theta)
    rows = jnp.stack(
        [o, z, z,
         z, c, -s,
         z, s, c], axis=-1)
    return rows.reshape(-1, 3, 3)


def rotation_matrix_z(theta: jnp.ndarray) -> jnp.ndarray:
    """[N] -> [N,3,3].  Reference utils.py:37-50: [[c,-s,0],[s,c,0],[0,0,1]]."""
    theta = theta.reshape(-1)
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(theta), jnp.ones_like(theta)
    rows = jnp.stack(
        [c, -s, z,
         s, c, z,
         z, z, o], axis=-1)
    return rows.reshape(-1, 3, 3)


def pose_rotation(yaw: jnp.ndarray, pitch: jnp.ndarray, roll: jnp.ndarray) -> jnp.ndarray:
    """R = Ry(pitch) @ Rx(yaw) @ Rz(roll)  (reference utils.py:57)."""
    return rotation_matrix_y(pitch) @ rotation_matrix_x(yaw) @ rotation_matrix_z(roll)


def transform_kp(canonical_kp: jnp.ndarray, yaw: jnp.ndarray, pitch: jnp.ndarray,
                 roll: jnp.ndarray, t: jnp.ndarray, scale: jnp.ndarray):
    """Pose the canonical keypoints.

    Args:
      canonical_kp: [N,K,3]
      yaw/pitch/roll: [N]
      t: [N,3]
      scale: [N,1,1,1] (or broadcastable to [N,K,3,1]) — HPE's scalar scale head.
    Returns:
      (transformed_kp [N,K,3], rot_mat [N,3,3]).  Reference utils.py:53-59.
    """
    rot_mat = pose_rotation(yaw, pitch, roll)
    scaled = scale * canonical_kp[..., None]             # [N,K,3,1]
    kp = jnp.matmul(rot_mat[:, None], scaled)[..., 0]    # [N,K,3]
    return kp + t[:, None, :], rot_mat


def transform_kp_with_new_pose(canonical_kp: jnp.ndarray, yaw, pitch, roll,
                               t: jnp.ndarray, delta: jnp.ndarray,
                               new_yaw, new_pitch, new_roll):
    """Re-pose keypoints to a new head pose (frontalization etc.).

    Reference utils.py:62-76: kp' = R_new @ kp_c + t + (R_new R_old^-1) @ delta,
    then shift z so the mean depth is 0.33.
    """
    old_rot = pose_rotation(yaw, pitch, roll)
    rot_mat = pose_rotation(new_yaw, new_pitch, new_roll)
    rel = jnp.matmul(rot_mat, jnp.linalg.inv(old_rot))
    kp = (jnp.matmul(rot_mat[:, None], canonical_kp[..., None])[..., 0]
          + t[:, None, :]
          + jnp.matmul(rel[:, None], delta[..., None])[..., 0])
    zt = 0.33 - kp[:, :, 2].mean()
    return kp + jnp.array([0.0, 0.0, 1.0], kp.dtype) * zt, rot_mat


def make_coordinate_grid_2d(spatial_size, dtype=jnp.float32) -> jnp.ndarray:
    """[H,W,2] grid with channel order (x=W, y=H), each in [-1,1].

    Reference utils.py:79-88 (align_corners=True spacing: endpoints at +-1).
    """
    h, w = spatial_size
    y = 2.0 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1.0
    x = 2.0 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1.0
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)


def make_coordinate_grid_3d(spatial_size, dtype=jnp.float32) -> jnp.ndarray:
    """[D,H,W,3] grid with channel order (x=W, y=H, z=D), each in [-1,1].

    Reference utils.py:91-103.
    """
    d, h, w = spatial_size
    z = 2.0 * (jnp.arange(d, dtype=dtype) / (d - 1)) - 1.0
    y = 2.0 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1.0
    x = 2.0 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1.0
    zz = jnp.broadcast_to(z[:, None, None], (d, h, w))
    yy = jnp.broadcast_to(y[None, :, None], (d, h, w))
    xx = jnp.broadcast_to(x[None, None, :], (d, h, w))
    return jnp.stack([xx, yy, zz], axis=-1)
