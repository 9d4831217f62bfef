"""Golden tests for the loss library vs torch oracles."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from torch import nn as tnn

from facevae_tpu.losses import (
    gan_loss_gen, gan_loss_dis, feature_matching_loss,
    equivariance_loss, keypoint_prior_loss, headpose_loss, deformation_prior_loss,
    kl_divergence_loss, recon_loss,
    VGGFeatures, PerceptualLoss, ContrastiveHead,
)
from facevae_tpu.losses.vgg import VGG19_BLOCKS


def test_gan_hinge(rng):
    x = rng.randn(2, 8, 8, 1).astype(np.float32)
    xt = torch.as_tensor(x)
    np.testing.assert_allclose(
        float(gan_loss_dis(jnp.asarray(x), True)),
        float(-torch.mean(torch.min(xt - 1, xt * 0))), rtol=1e-6)
    np.testing.assert_allclose(
        float(gan_loss_dis(jnp.asarray(x), False)),
        float(-torch.mean(torch.min(-xt - 1, xt * 0))), rtol=1e-6)
    np.testing.assert_allclose(float(gan_loss_gen(jnp.asarray(x))),
                               float(-xt.mean()), rtol=1e-6)


def test_feature_matching_quirk(rng):
    """Replicates the reference double-index: each feature contributes
    (batch/num_d) * mean-L1 (losses.py:187-195)."""
    feats_f = [rng.randn(3, 4, 4, 8).astype(np.float32) for _ in range(4)]
    feats_r = [rng.randn(3, 4, 4, 8).astype(np.float32) for _ in range(4)]
    got = float(feature_matching_loss([jnp.asarray(f) for f in feats_f],
                                      [jnp.asarray(r) for r in feats_r]))
    # torch oracle with the reference's exact loop
    crit = tnn.L1Loss()
    loss = torch.zeros(())
    for i in range(4):
        for j in range(3):   # iterates the batch dim, reference quirk
            loss = loss + (1.0 / 4) * crit(torch.as_tensor(feats_f[i][j]),
                                           torch.as_tensor(feats_r[i][j]))
    np.testing.assert_allclose(got, float(loss), rtol=1e-5)


def test_keypoint_prior_vs_torch(rng):
    kp = torch.as_tensor(rng.randn(3, 15, 3).astype(np.float32) * 0.4)
    dist = torch.cdist(kp, kp).square()
    expect = (torch.max(0 * dist, 0.1 - dist).sum((1, 2)).mean()
              + torch.abs(kp[:, :, 2].mean(1) - 0.33).mean() - 15 * 0.1)
    got = float(keypoint_prior_loss(jnp.asarray(kp.numpy())))
    np.testing.assert_allclose(got, float(expect), rtol=1e-4)


def test_headpose_equivariance_deformation_kl_recon(rng):
    yaw, ryaw = rng.randn(4).astype(np.float32), rng.randn(4).astype(np.float32)
    got = float(headpose_loss(*(jnp.asarray(a) for a in (yaw, yaw, yaw, ryaw, ryaw, ryaw))))
    expect = float(torch.mean(torch.abs(torch.as_tensor(yaw) - torch.as_tensor(ryaw)))) / math.pi * 180
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    kp = rng.randn(2, 5, 3).astype(np.float32)
    rev = rng.randn(2, 5, 2).astype(np.float32)
    np.testing.assert_allclose(
        float(equivariance_loss(jnp.asarray(kp), jnp.asarray(rev))),
        float(F.l1_loss(torch.as_tensor(kp)[:, :, :2], torch.as_tensor(rev))), rtol=1e-5)

    d = rng.randn(2, 5, 3).astype(np.float32)
    np.testing.assert_allclose(float(deformation_prior_loss(jnp.asarray(d))),
                               float(torch.as_tensor(d).abs().mean()), rtol=1e-6)

    mu = rng.randn(2, 16).astype(np.float32)
    logstd = rng.randn(2, 16).astype(np.float32) * 0.1
    mu_t, ls_t = torch.as_tensor(mu), torch.as_tensor(logstd)
    expect_kl = torch.mean(-0.5 - ls_t + 0.5 * mu_t ** 2 + 0.5 * torch.exp(2 * ls_t), dim=-1).mean()
    np.testing.assert_allclose(float(kl_divergence_loss(jnp.asarray(mu), jnp.asarray(logstd))),
                               float(expect_kl), rtol=1e-5)

    a, b = rng.randn(2, 8).astype(np.float32), rng.randn(2, 8).astype(np.float32)
    np.testing.assert_allclose(float(recon_loss(jnp.asarray(a), jnp.asarray(b))),
                               float(F.mse_loss(torch.as_tensor(a), torch.as_tensor(b))), rtol=1e-5)


def test_vgg_features_vs_torch(rng):
    """Our truncated VGG19 stack == a torch conv stack with the same weights."""
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    m = VGGFeatures(VGG19_BLOCKS)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    taps = m.apply(v, jnp.asarray(x))
    assert set(taps) == {"relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1", "relu_5_1"}
    assert taps["relu_5_1"].shape == (1, 4, 4, 512)

    # torch oracle: replicate conv/pool layout, copy weights
    params = v["params"]
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)))
    out = {}
    h = xt
    for bi, widths in enumerate(VGG19_BLOCKS):
        if bi > 0:
            h = F.max_pool2d(h, 2, 2)
        for ci, width in enumerate(widths):
            p = params[f"conv{bi + 1}_{ci + 1}"]
            w = torch.as_tensor(np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))
            b = torch.as_tensor(np.asarray(p["bias"]))
            h = F.relu(F.conv2d(h, w, b, 1, 1))
            if ci == 0:
                out[f"relu_{bi + 1}_1"] = h
    for k in taps:
        np.testing.assert_allclose(np.asarray(taps[k]),
                                   np.transpose(out[k].numpy(), (0, 2, 3, 1)),
                                   rtol=1e-3, atol=1e-4)


def test_perceptual_loss_runs_and_quirk(rng):
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    y = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    m = PerceptualLoss(n_scales=2)
    v = m.init(jax.random.PRNGKey(0), x, y)
    loss = m.apply(v, x, y)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # identical inputs -> only detach asymmetry remains; should be ~0
    loss_same = m.apply(v, x, x)
    assert float(loss_same) < 1e-5
    # fixed pyramid costs more terms -> different (>=) value
    m_fixed = PerceptualLoss(n_scales=2, fixed_pyramid=True)
    loss_fixed = m_fixed.apply(v, x, y)
    assert float(loss_fixed) >= float(loss) - 1e-6


def test_contrastive_head_vs_torch(rng):
    """SimSiam head parity with copied weights, train mode BN."""
    f1 = rng.randn(4, 512).astype(np.float32)
    f2 = rng.randn(4, 512).astype(np.float32)
    m = ContrastiveHead()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(f1), jnp.asarray(f2), train=True)
    got, _ = m.apply(v, jnp.asarray(f1), jnp.asarray(f2), train=True,
                     mutable=["batch_stats"])

    # torch oracle (reference losses.py:243-278 layout)
    proj = tnn.Sequential(
        tnn.Linear(512, 512, bias=False), tnn.BatchNorm1d(512), tnn.ReLU(),
        tnn.Linear(512, 512, bias=False), tnn.BatchNorm1d(512), tnn.ReLU(),
        tnn.Linear(512, 512, bias=True), tnn.BatchNorm1d(512, affine=False))
    pred = tnn.Sequential(
        tnn.Linear(512, 512, bias=False), tnn.BatchNorm1d(512), tnn.ReLU(),
        tnn.Linear(512, 512))
    p = v["params"]
    with torch.no_grad():
        for tmod, name in ((proj[0], "proj_fc1"), (proj[3], "proj_fc2"),
                           (proj[6], "proj_fc3"), (pred[0], "pred_fc1"),
                           (pred[3], "pred_fc2")):
            tmod.weight.copy_(torch.as_tensor(np.asarray(p["projection" if name.startswith("proj") else "predictor"][name]["kernel"]).T))
            if tmod.bias is not None:
                tmod.bias.copy_(torch.as_tensor(np.asarray(p["projection" if name.startswith("proj") else "predictor"][name]["bias"])))
        for tmod, name in ((proj[1], "proj_bn1"), (proj[4], "proj_bn2"),
                           (pred[1], "pred_bn1")):
            tmod.weight.copy_(torch.as_tensor(np.asarray(p["projection" if name.startswith("proj") else "predictor"][name]["scale"])))
            tmod.bias.copy_(torch.as_tensor(np.asarray(p["projection" if name.startswith("proj") else "predictor"][name]["bias"])))
    crit = tnn.CosineSimilarity(dim=1)
    z1, z2 = proj(torch.as_tensor(f1)), proj(torch.as_tensor(f2))
    p1, p2 = pred(z1), pred(z2)
    expect = 1 - (crit(p1, z2.detach()).mean() + crit(p2, z1.detach()).mean()) * 0.5
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-3, atol=1e-4)


def test_contrastive_conv_heads_smoke(rng):
    """Dormant conv contrastive heads (reference losses.py:281-382) run and
    give finite, symmetric-zero losses on identical inputs."""
    from facevae_tpu.losses import ContrastiveHeadConv, ContrastiveHeadConv2, LPIPS

    f = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32))
    g = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32))

    lpips = LPIPS()
    lv = lpips.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                    jnp.zeros((1, 32, 32, 3)))
    head = ContrastiveHeadConv()
    # LPIPS needs >=32px inputs for its 5 pools; upsample the feature maps
    f32 = jnp.repeat(jnp.repeat(f, 4, 1), 4, 2)
    g32 = jnp.repeat(jnp.repeat(g, 4, 1), 4, 2)
    v = head.init(jax.random.PRNGKey(1), f32, g32, lv)
    loss = head.apply(v, f32, g32, lv)
    same = head.apply(v, f32, f32, lv)
    assert np.isfinite(float(loss))
    assert abs(float(same)) < 1e-5       # LPIPS distance of identical inputs

    head2 = ContrastiveHeadConv2(in_dim=16, out_dim=8, dim_linear=8 * 4 * 4)
    v2 = head2.init(jax.random.PRNGKey(2), f, g)
    loss2, _ = head2.apply(v2, f, g, mutable=["batch_stats"])
    assert np.isfinite(float(loss2))
