"""Golden tests for motion-field construction and the TPS equivariance warp."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from facevae_tpu.ops import (
    create_heatmap_representations, create_sparse_motions, create_deformed_source_image,
    kp2gaussian_3d, make_coordinate_grid_3d, make_coordinate_grid_2d,
    random_transform_params, warp_coordinates, transform_frame, TransformParams,
)


def _setup(rng, N=2, K=4, D=4, H=8, W=8, C=3):
    fs = rng.randn(N, D, H, W, C).astype(np.float32)
    kp_s = (rng.rand(N, K, 3).astype(np.float32) * 2 - 1) * 0.5
    kp_d = (rng.rand(N, K, 3).astype(np.float32) * 2 - 1) * 0.5
    # random valid rotations via QR
    def rot(n):
        q, _ = np.linalg.qr(rng.randn(n, 3, 3))
        return q.astype(np.float32)
    return fs, kp_s, kp_d, rot(N), rot(N)


def test_heatmap_representations(rng):
    fs, kp_s, kp_d, Rs, Rd = _setup(rng)
    heat = np.asarray(create_heatmap_representations(jnp.asarray(fs), jnp.asarray(kp_s), jnp.asarray(kp_d)))
    assert heat.shape == (2, 5, 4, 8, 8)
    expect = (np.asarray(kp2gaussian_3d(jnp.asarray(kp_d), (4, 8, 8)))
              - np.asarray(kp2gaussian_3d(jnp.asarray(kp_s), (4, 8, 8))))
    np.testing.assert_allclose(heat[:, 1:], expect, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(heat[:, 0], 0)


def test_sparse_motions_identity_pose(rng):
    """With Rs=Rd=I and kp_s=kp_d, every motion field equals the identity grid."""
    fs, kp_s, _, _, _ = _setup(rng)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3)).copy()
    motions = np.asarray(create_sparse_motions(jnp.asarray(fs), jnp.asarray(kp_s),
                                               jnp.asarray(kp_s), jnp.asarray(eye), jnp.asarray(eye)))
    grid = np.asarray(make_coordinate_grid_3d((4, 8, 8)))
    for k in range(motions.shape[1]):
        np.testing.assert_allclose(motions[:, k], np.broadcast_to(grid, (2, 4, 8, 8, 3)),
                                   rtol=1e-4, atol=1e-5)


def test_sparse_motions_oracle(rng):
    fs, kp_s, kp_d, Rs, Rd = _setup(rng)
    motions = np.asarray(create_sparse_motions(jnp.asarray(fs), jnp.asarray(kp_s), jnp.asarray(kp_d),
                                               jnp.asarray(Rs), jnp.asarray(Rd)))
    grid = np.asarray(make_coordinate_grid_3d((4, 8, 8)))
    jac = Rs @ np.linalg.inv(Rd)
    for n in range(2):
        for k in range(kp_s.shape[1]):
            disp = grid - kp_d[n, k]
            expect = disp @ jac[n].T + kp_s[n, k]
            np.testing.assert_allclose(motions[n, k + 1], expect, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(motions[:, 0], np.broadcast_to(grid, (2, 4, 8, 8, 3)), atol=1e-6)


def test_deformed_source_vs_torch(rng):
    fs, kp_s, kp_d, Rs, Rd = _setup(rng)
    motions = create_sparse_motions(jnp.asarray(fs), jnp.asarray(kp_s), jnp.asarray(kp_d),
                                    jnp.asarray(Rs), jnp.asarray(Rd))
    got = np.asarray(create_deformed_source_image(jnp.asarray(fs), motions))
    N, K1 = got.shape[:2]
    src = torch.as_tensor(np.transpose(fs, (0, 4, 1, 2, 3)))            # NCDHW
    src = src.unsqueeze(1).repeat(1, K1, 1, 1, 1, 1).view(N * K1, 3, 4, 8, 8)
    g = torch.as_tensor(np.asarray(motions)).view(N * K1, 4, 8, 8, 3)
    expect = F.grid_sample(src, g, align_corners=True).view(N, K1, 3, 4, 8, 8)
    np.testing.assert_allclose(got, np.transpose(expect.numpy(), (0, 1, 3, 4, 5, 2)),
                               rtol=1e-4, atol=1e-5)


def test_tps_vs_torch_oracle(rng):
    """warp_coordinates + transform_frame vs a torch re-derivation of
    reference trainer.py:91-129."""
    N, H, W, C = 2, 16, 16, 3
    key = jax.random.PRNGKey(0)
    tp = random_transform_params(key, N)
    frame = rng.rand(N, H, W, C).astype(np.float32)

    theta = torch.as_tensor(np.asarray(tp.theta))
    cp = torch.as_tensor(np.asarray(tp.control_points))
    cparams = torch.as_tensor(np.asarray(tp.control_params))

    def torch_warp(coords):
        th = theta.unsqueeze(1)
        transformed = (th[:, :, :, :2] @ coords.unsqueeze(-1)).squeeze(-1) + th[:, :, :, 2]
        distances = (coords.view(coords.shape[0], -1, 1, 2) - cp.view(1, 1, -1, 2)).abs().sum(-1)
        result = distances ** 2 * torch.log(distances + 1e-6) * cparams
        return transformed + result.sum(2).view(N, coords.shape[1], 1)

    grid2 = np.asarray(make_coordinate_grid_2d((H, W))).reshape(1, H * W, 2)
    expect_coords = torch_warp(torch.as_tensor(grid2))
    got_coords = np.asarray(warp_coordinates(tp, jnp.asarray(grid2)))
    np.testing.assert_allclose(got_coords, expect_coords.numpy(), rtol=1e-4, atol=1e-5)

    got_frame = np.asarray(transform_frame(tp, jnp.asarray(frame)))
    tgrid = expect_coords.view(N, H, W, 2)
    expect_frame = F.grid_sample(torch.as_tensor(np.transpose(frame, (0, 3, 1, 2))),
                                 tgrid, align_corners=True, padding_mode="reflection")
    np.testing.assert_allclose(got_frame, np.transpose(expect_frame.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_analytic_motion_equivalence(rng):
    """sparse_motion_pixel_coords/blend_deformation equal the materialized
    create_sparse_motions construction (same math, no [N,K+1,D,H,W,3])."""
    from facevae_tpu.ops.motion import (
        create_sparse_motions, motion_affine_params,
        sparse_motion_pixel_coords, blend_deformation)

    N, D, H, W, K = 2, 4, 6, 6, 3
    fs = jnp.zeros((N, D, H, W, 2), jnp.float32)
    kp_s = jnp.asarray(rng.rand(N, K, 3) * 1.6 - 0.8, jnp.float32)
    kp_d = jnp.asarray(rng.rand(N, K, 3) * 1.6 - 0.8, jnp.float32)
    q, _ = np.linalg.qr(rng.randn(N, 3, 3))
    q2, _ = np.linalg.qr(rng.randn(N, 3, 3))
    Rs, Rd = jnp.asarray(q, jnp.float32), jnp.asarray(q2, jnp.float32)

    sm = create_sparse_motions(fs, kp_s, kp_d, Rs, Rd)     # [N,K+1,D,H,W,3]
    jac, b = motion_affine_params(kp_s, kp_d, Rs, Rd)
    cgx, cgy, cgz = sparse_motion_pixel_coords((D, H, W), jac, b)

    NV = D * H * W
    sm_flat = np.asarray(sm).reshape(N, K + 1, NV, 3)
    np.testing.assert_allclose(np.asarray(cgx),
                               (sm_flat[..., 0] + 1) * (W - 1) / 2,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cgz),
                               (sm_flat[..., 2] + 1) * (D - 1) / 2,
                               rtol=1e-4, atol=1e-4)

    logits = jnp.asarray(rng.randn(N, D, H, W, K + 1), jnp.float32)
    mask = jax.nn.softmax(logits, axis=-1)
    want = jnp.einsum("ndhwk,nkdhwc->ndhwc", mask, sm)
    got = blend_deformation(mask, jac, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
