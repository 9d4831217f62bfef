"""Golden tests for ops/geometry + ops/heatmap vs torch-computed oracles.

The reference repo has no tests; per SURVEY.md §4 the reference semantics are
the oracle.  The torch oracle code below re-derives the reference math
independently (matrix layouts from /root/reference/utils.py:5-136) on CPU.
"""
import numpy as np
import jax.numpy as jnp
import torch
import pytest

from facevae_tpu.ops import (
    rotation_matrix_x, rotation_matrix_y, rotation_matrix_z,
    transform_kp, transform_kp_with_new_pose,
    make_coordinate_grid_2d, make_coordinate_grid_3d,
    out2heatmap, heatmap2kp, kp2gaussian_2d, kp2gaussian_3d,
)


def torch_rot_x(theta):
    t = torch.as_tensor(theta).reshape(-1)
    c, s = torch.cos(t), torch.sin(t)
    z, o = torch.zeros_like(t), torch.ones_like(t)
    return torch.stack([c, z, s, z, o, z, -s, z, c], -1).reshape(-1, 3, 3)


def torch_rot_y(theta):
    t = torch.as_tensor(theta).reshape(-1)
    c, s = torch.cos(t), torch.sin(t)
    z, o = torch.zeros_like(t), torch.ones_like(t)
    return torch.stack([o, z, z, z, c, -s, z, s, c], -1).reshape(-1, 3, 3)


def torch_rot_z(theta):
    t = torch.as_tensor(theta).reshape(-1)
    c, s = torch.cos(t), torch.sin(t)
    z, o = torch.zeros_like(t), torch.ones_like(t)
    return torch.stack([c, -s, z, s, c, z, z, z, o], -1).reshape(-1, 3, 3)


def test_rotation_matrices(rng):
    theta = rng.randn(4).astype(np.float32)
    np.testing.assert_allclose(rotation_matrix_x(jnp.asarray(theta)), torch_rot_x(theta).numpy(), rtol=1e-6)
    np.testing.assert_allclose(rotation_matrix_y(jnp.asarray(theta)), torch_rot_y(theta).numpy(), rtol=1e-6)
    np.testing.assert_allclose(rotation_matrix_z(jnp.asarray(theta)), torch_rot_z(theta).numpy(), rtol=1e-6)


def test_transform_kp(rng):
    N, K = 3, 15
    kp_c = rng.randn(N, K, 3).astype(np.float32)
    yaw, pitch, roll = [rng.randn(N).astype(np.float32) * 0.3 for _ in range(3)]
    t = rng.randn(N, 3).astype(np.float32) * 0.1
    scale = rng.rand(N, 1, 1, 1).astype(np.float32) + 0.5

    # torch oracle (utils.py:53-59)
    rot = torch_rot_y(pitch) @ torch_rot_x(yaw) @ torch_rot_z(roll)
    kp_t = torch.as_tensor(kp_c)
    scaled = torch.as_tensor(scale) * kp_t.unsqueeze(-1)
    expect = (rot.unsqueeze(1) @ scaled).squeeze(-1) + torch.as_tensor(t).unsqueeze(1)

    got_kp, got_rot = transform_kp(jnp.asarray(kp_c), jnp.asarray(yaw), jnp.asarray(pitch),
                                   jnp.asarray(roll), jnp.asarray(t), jnp.asarray(scale))
    np.testing.assert_allclose(got_kp, expect.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_rot, rot.numpy(), rtol=1e-5, atol=1e-6)


def test_transform_kp_with_new_pose(rng):
    N, K = 2, 5
    kp_c = rng.randn(N, K, 3).astype(np.float32)
    yaw, pitch, roll = [rng.randn(N).astype(np.float32) * 0.3 for _ in range(3)]
    t = rng.randn(N, 3).astype(np.float32) * 0.1
    delta = rng.randn(N, K, 3).astype(np.float32) * 0.05
    zero = np.zeros(N, np.float32)

    # torch oracle (utils.py:62-76)
    old_rot = torch_rot_y(pitch) @ torch_rot_x(yaw) @ torch_rot_z(roll)
    new_rot = torch_rot_y(zero) @ torch_rot_x(zero) @ torch_rot_z(zero)
    R = new_rot @ torch.inverse(old_rot)
    kp_t = torch.as_tensor(kp_c)
    expect = ((new_rot.unsqueeze(1) @ kp_t.unsqueeze(-1)).squeeze(-1)
              + torch.as_tensor(t).unsqueeze(1)
              + (R.unsqueeze(1) @ torch.as_tensor(delta).unsqueeze(-1)).squeeze(-1))
    zt = 0.33 - expect[:, :, 2].mean()
    expect = expect + torch.tensor([0.0, 0.0, zt])

    got, _ = transform_kp_with_new_pose(
        jnp.asarray(kp_c), jnp.asarray(yaw), jnp.asarray(pitch), jnp.asarray(roll),
        jnp.asarray(t), jnp.asarray(delta), jnp.asarray(zero), jnp.asarray(zero), jnp.asarray(zero))
    np.testing.assert_allclose(got, expect.numpy(), rtol=1e-4, atol=1e-5)


def test_coordinate_grids():
    g2 = np.asarray(make_coordinate_grid_2d((4, 6)))
    assert g2.shape == (4, 6, 2)
    # channel 0 = x (W axis), channel 1 = y (H axis); endpoints at -1/+1
    np.testing.assert_allclose(g2[0, :, 0], np.linspace(-1, 1, 6), rtol=1e-6)
    np.testing.assert_allclose(g2[:, 0, 1], np.linspace(-1, 1, 4), rtol=1e-6)

    g3 = np.asarray(make_coordinate_grid_3d((3, 4, 5)))
    assert g3.shape == (3, 4, 5, 3)
    np.testing.assert_allclose(g3[0, 0, :, 0], np.linspace(-1, 1, 5), rtol=1e-6)
    np.testing.assert_allclose(g3[0, :, 0, 1], np.linspace(-1, 1, 4), rtol=1e-6)
    np.testing.assert_allclose(g3[:, 0, 0, 2], np.linspace(-1, 1, 3), rtol=1e-6)


def test_out2heatmap_softargmax(rng):
    N, K, D, H, W = 2, 3, 4, 6, 6
    out = rng.randn(N, K, D, H, W).astype(np.float32)
    heat = out2heatmap(jnp.asarray(out))
    # matches softmax over flattened spatial at T=0.1
    expect = torch.softmax(torch.as_tensor(out).view(N, K, -1) / 0.1, dim=2).view(N, K, D, H, W)
    np.testing.assert_allclose(heat, expect.numpy(), rtol=1e-5, atol=1e-6)

    # a delta heatmap soft-argmaxes to the grid location
    delta = np.zeros((1, 1, D, H, W), np.float32)
    delta[0, 0, 1, 2, 3] = 1.0
    kp = np.asarray(heatmap2kp(jnp.asarray(delta)))
    grid = np.asarray(make_coordinate_grid_3d((D, H, W)))
    np.testing.assert_allclose(kp[0, 0], grid[1, 2, 3], rtol=1e-5, atol=1e-6)


def test_kp2gaussian(rng):
    kp = (rng.rand(2, 4, 3).astype(np.float32) * 2 - 1)
    g3 = np.asarray(kp2gaussian_3d(jnp.asarray(kp), (4, 8, 8)))
    assert g3.shape == (2, 4, 4, 8, 8)
    # oracle: exp(-0.5 * ||grid - kp||^2 / 0.01)
    grid = np.asarray(make_coordinate_grid_3d((4, 8, 8)))
    diff = grid[None, None] - kp[:, :, None, None, None, :]
    expect = np.exp(-0.5 * (diff ** 2).sum(-1) / 0.01)
    np.testing.assert_allclose(g3, expect, rtol=1e-4, atol=1e-6)

    g2 = np.asarray(kp2gaussian_2d(jnp.asarray(kp[..., :2]), (8, 8)))
    grid2 = np.asarray(make_coordinate_grid_2d((8, 8)))
    diff2 = grid2[None, None] - kp[:, :, None, None, :2]
    expect2 = np.exp(-0.5 * (diff2 ** 2).sum(-1) / 0.01)
    np.testing.assert_allclose(g2, expect2, rtol=1e-4, atol=1e-6)
