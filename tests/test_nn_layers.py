"""Golden tests: nn layers/blocks vs torch with copied weights."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from torch import nn as tnn
import pytest

from facevae_tpu.nn import (
    Conv, Dense, BatchNorm, InstanceNorm, ConvBlock,
    DownBlock2D, UpBlock3D, ResBlock2D, ResBottleneck, LinearELR,
)


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_conv2d_parity(rng):
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    m = Conv(6, 3, strides=2, padding=1, dim=2)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tconv = tnn.Conv2d(4, 6, 3, 2, 1)
    # copy jax weights into torch: HWIO -> OIHW
    k = np.asarray(variables["params"]["kernel"])
    with torch.no_grad():
        tconv.weight.copy_(torch.as_tensor(np.transpose(k, (3, 2, 0, 1))))
        tconv.bias.copy_(torch.as_tensor(np.asarray(variables["params"]["bias"])))
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    expect = tconv(torch.as_tensor(nchw(x))).detach().numpy()
    np.testing.assert_allclose(got, nhwc(expect), rtol=1e-4, atol=1e-5)


def test_conv3d_z_banded_exact(rng):
    """z_banded execution (depth-folded 2D conv with a banded kernel) is the
    SAME function of the SAME params as the direct 3D conv — checked on the
    mask-conv geometry (7³, z-padding 3) and an asymmetric-pad variant."""
    x = rng.randn(2, 6, 8, 8, 5).astype(np.float32)
    for k, p in ((7, 3), (3, 1)):
        m_dir = Conv(4, k, 1, p, dim=3)
        m_band = Conv(4, k, 1, p, dim=3, z_banded=True)
        v = m_dir.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(m_band.apply(v, jnp.asarray(x)))
        want = np.asarray(m_dir.apply(v, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # grads agree too (the band embedding is linear in the kernel)
    def loss(mod, v):
        return jnp.sum(mod.apply(v, jnp.asarray(x)) ** 2)

    m_dir = Conv(4, 7, 1, 3, dim=3)
    m_band = Conv(4, 7, 1, 3, dim=3, z_banded=True)
    v = m_dir.init(jax.random.PRNGKey(1), jnp.asarray(x))
    g_dir = jax.grad(lambda v: loss(m_dir, v))(v)
    g_band = jax.grad(lambda v: loss(m_band, v))(v)
    np.testing.assert_allclose(np.asarray(g_band["params"]["kernel"]),
                               np.asarray(g_dir["params"]["kernel"]),
                               rtol=1e-4, atol=1e-3)


def test_conv_depth_folded_exact(rng):
    """Conv(depth_folded=D) on a fold_depth'd input is the SAME function of
    the SAME params as the unfolded path, for both folded consumers:
    the z-banded 3D conv (skips its internal fold) and the dim=2 conv over
    torch's c-major view(N, C*D, H, W) channels (kernel permuted, not the
    activation) — the sharing MFE uses (models/mfe.py)."""
    from facevae_tpu.nn import fold_depth

    x = rng.randn(2, 6, 8, 8, 5).astype(np.float32)
    N, D, H, W, C = x.shape
    x2 = fold_depth(jnp.asarray(x))
    assert x2.shape == (N, H, W, D * C)

    # z-banded: folded input, volume output
    m_band = Conv(4, 7, 1, 3, dim=3, z_banded=True)
    m_fold = Conv(4, 7, 1, 3, dim=3, z_banded=True, depth_folded=D)
    v = m_band.init(jax.random.PRNGKey(0), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(m_fold.apply(v, x2)),
                               np.asarray(m_band.apply(v, jnp.asarray(x))),
                               rtol=1e-5, atol=1e-5)

    # dim=2 over c-major folded channels (the occlusion-conv contract)
    cmaj = jnp.asarray(x).transpose(0, 2, 3, 4, 1).reshape(N, H, W, C * D)
    m2 = Conv(3, 7, 1, 3, dim=2)
    m2f = Conv(3, 7, 1, 3, dim=2, depth_folded=D)
    v2 = m2.init(jax.random.PRNGKey(1), cmaj)
    np.testing.assert_allclose(np.asarray(m2f.apply(v2, x2)),
                               np.asarray(m2.apply(v2, cmaj)),
                               rtol=1e-5, atol=1e-5)

    # kernel grads land in the checkpoint (c-major) layout on both paths
    g2 = jax.grad(lambda v: jnp.sum(m2.apply(v, cmaj) ** 2))(v2)
    g2f = jax.grad(lambda v: jnp.sum(m2f.apply(v, x2) ** 2))(v2)
    np.testing.assert_allclose(np.asarray(g2f["params"]["kernel"]),
                               np.asarray(g2["params"]["kernel"]),
                               rtol=1e-4, atol=1e-3)


def test_s2d_blocks_exact(rng, monkeypatch):
    """Block-level space-to-depth packed execution (FACEVAE_S2D=1): the
    packed Res/Down/Up 3D blocks compute the same function of the SAME param
    tree as the direct path, including BatchNorm train-mode batch stats
    (lane-grouped reduction) and kernel grads."""
    from facevae_tpu.nn import ResBlock3D, DownBlock3D, UpBlock3D

    from facevae_tpu.nn import ResBlock2D, DownBlock2D, UpBlock2D

    x = jnp.asarray(rng.randn(2, 4, 32, 32, 6), np.float32)
    x2 = jnp.asarray(rng.randn(2, 32, 32, 6), np.float32)
    for mod, xin in ((ResBlock3D(6), x), (DownBlock3D(6, 8), x),
                     (UpBlock3D(6, 8), jnp.asarray(rng.randn(2, 4, 16, 16, 6),
                                                   np.float32)),
                     (ResBlock2D(6), x2), (DownBlock2D(6, 8), x2),
                     (UpBlock2D(6, 8), jnp.asarray(rng.randn(2, 16, 16, 6),
                                                   np.float32))):
        monkeypatch.setenv("FACEVAE_S2D", "0")
        v = mod.init(jax.random.PRNGKey(0), xin)
        want, st_dir = mod.apply(v, xin, train=True, mutable=["batch_stats"])
        monkeypatch.setenv("FACEVAE_S2D", "1")
        v1 = mod.init(jax.random.PRNGKey(0), xin)
        assert jax.tree.map(jnp.shape, v1) == jax.tree.map(jnp.shape, v)
        got, st_s2d = mod.apply(v, xin, train=True, mutable=["batch_stats"])
        name = type(mod).__name__
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5, err_msg=name)
        for a, b in zip(jax.tree.leaves(st_dir), jax.tree.leaves(st_s2d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=name)

    # grads agree through the packed residual stack
    mod = ResBlock3D(6)
    monkeypatch.setenv("FACEVAE_S2D", "0")
    v = mod.init(jax.random.PRNGKey(2), x)

    def loss(v):
        y, _ = mod.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    g_dir = jax.grad(loss)(v)
    monkeypatch.setenv("FACEVAE_S2D", "1")
    g_s2d = jax.grad(loss)(v)
    # atol covers the conv-bias grad, which is mathematically ~0 (BN directly
    # downstream removes any bias shift) and hence cancellation noise in both
    # paths; every other leaf agrees to ~1e-6 relative at scales of 1e2-1e3
    for a, b in zip(jax.tree.leaves(g_dir), jax.tree.leaves(g_s2d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-2)

    # odd spatial / big channels fall back to the direct path (no crash)
    x_odd = jnp.asarray(rng.randn(1, 4, 34, 34, 6), np.float32)
    v2 = ResBlock3D(6).init(jax.random.PRNGKey(1), x_odd)
    assert ResBlock3D(6).apply(v2, x_odd, train=False).shape == x_odd.shape


def test_conv2d_7x7_packed_exact(rng, monkeypatch):
    """Odd-k (7x7) phase-packed 2D conv equals the direct conv (the
    generator's out_conv geometry, 64->3)."""
    from facevae_tpu.nn.layers import s2d_pack, s2d_unpack

    x = jnp.asarray(rng.randn(2, 32, 32, 10), np.float32)
    m_dir = Conv(3, 7, 1, 3, dim=2)
    m_pack = Conv(3, 7, 1, 3, dim=2, s2d_io=True)
    v = m_dir.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m_dir.apply(v, x))
    got = np.asarray(s2d_unpack(m_pack.apply(v, s2d_pack(x))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_efe_packed_tail_exact(rng, monkeypatch):
    """EFE's packed tail (out_conv -> phase-interleaved gaussian concat ->
    mix stack) is the same function as the direct path."""
    from facevae_tpu.models.efe import EFEConv

    m = EFEConv(variant="conv4", down_seq=(3, 8), up_seq=(8, 8), D=4, K=5,
                n_res=1, scale_factor=0.25, use_vae=False)
    x = jnp.asarray(rng.rand(2, 128, 128, 3), np.float32)
    kp = jnp.asarray(rng.rand(2, 5, 3) * 0.5, np.float32)
    monkeypatch.setenv("FACEVAE_S2D", "0")
    v = m.init(jax.random.PRNGKey(0), x, None, kp)
    kp0, *_ = m.apply(v, x, None, kp, train=False)
    monkeypatch.setenv("FACEVAE_S2D", "1")
    v1 = m.init(jax.random.PRNGKey(0), x, None, kp)
    assert jax.tree.map(jnp.shape, v1) == jax.tree.map(jnp.shape, v)
    kp1, *_ = m.apply(v, x, None, kp, train=False)
    np.testing.assert_allclose(np.asarray(kp1), np.asarray(kp0),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_parity(rng):
    x = rng.randn(2, 4, 8, 8, 3).astype(np.float32)
    m = Conv(5, 3, strides=1, padding=1, dim=3)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tconv = tnn.Conv3d(3, 5, 3, 1, 1)
    k = np.asarray(variables["params"]["kernel"])  # DHWIO
    with torch.no_grad():
        tconv.weight.copy_(torch.as_tensor(np.transpose(k, (4, 3, 0, 1, 2))))
        tconv.bias.copy_(torch.as_tensor(np.asarray(variables["params"]["bias"])))
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    expect = tconv(torch.as_tensor(np.transpose(x, (0, 4, 1, 2, 3)))).detach().numpy()
    np.testing.assert_allclose(got, np.transpose(expect, (0, 2, 3, 4, 1)), rtol=1e-4, atol=1e-5)


def test_batchnorm_train_and_eval_parity(rng):
    x1 = rng.randn(4, 6, 6, 5).astype(np.float32) * 2 + 1
    x2 = rng.randn(4, 6, 6, 5).astype(np.float32)
    m = BatchNorm(5)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x1), train=True)
    tbn = tnn.BatchNorm2d(5)

    # two training steps, check outputs and running stats track torch
    v = variables
    for x in (x1, x2):
        got, updates = m.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
        v = {**v, "batch_stats": updates["batch_stats"]}
        expect = tbn(torch.as_tensor(nchw(x))).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), nhwc(expect), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval mode uses running stats
    tbn.eval()
    got_eval = np.asarray(m.apply(v, jnp.asarray(x1), train=False))
    expect_eval = tbn(torch.as_tensor(nchw(x1))).detach().numpy()
    np.testing.assert_allclose(got_eval, nhwc(expect_eval), rtol=1e-4, atol=1e-4)


def test_sync_batchnorm_equals_global_batchnorm(rng):
    """pmean'd per-device stats == single-device stats on the concatenated batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    x = rng.randn(8, 4, 4, 3).astype(np.float32)
    m_sync = BatchNorm(3, axis_name="data")
    m_ref = BatchNorm(3)
    v = m_ref.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    def fwd(xs):
        out, upd = m_sync.apply(v, xs, train=True, mutable=["batch_stats"])
        return out, upd["batch_stats"]["mean"], upd["batch_stats"]["var"]

    out_sync, mean_sync, var_sync = jax.jit(shard_map(
        fwd, mesh=mesh, in_specs=P("data"), out_specs=(P("data"), P(), P())))(jnp.asarray(x))

    out_ref, upd_ref = m_ref.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_sync), np.asarray(out_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_sync), np.asarray(upd_ref["batch_stats"]["mean"]),
                               rtol=1e-4, atol=1e-6)
    # unbiased-var correction differs: sync uses global count (torch SyncBN does too)
    np.testing.assert_allclose(np.asarray(var_sync), np.asarray(upd_ref["batch_stats"]["var"]),
                               rtol=1e-3, atol=1e-5)


def test_instance_norm_parity(rng):
    x = rng.randn(2, 5, 5, 4).astype(np.float32)
    m = InstanceNorm(4)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tin = tnn.InstanceNorm2d(4, affine=True)
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    expect = tin(torch.as_tensor(nchw(x))).detach().numpy()
    np.testing.assert_allclose(got, nhwc(expect), rtol=1e-4, atol=1e-5)


def test_spectral_norm_conv_parity(rng):
    """Our spectral-normed conv matches torch.nn.utils.spectral_norm given the
    same weights and power-iteration state, over several training steps."""
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    m = Conv(4, 3, 1, 1, dim=2, use_spectral_norm=True)
    v = m.init(jax.random.PRNGKey(1), jnp.asarray(x), train=True)

    tconv = tnn.Conv2d(3, 4, 3, 1, 1)
    k = np.asarray(v["params"]["kernel"])
    with torch.no_grad():
        tconv.weight.copy_(torch.as_tensor(np.transpose(k, (3, 2, 0, 1))))
        tconv.bias.copy_(torch.as_tensor(np.asarray(v["params"]["bias"])))
    tconv = tnn.utils.spectral_norm(tconv)
    # align power-iteration state: torch weight_mat is (O, I*KH*KW); ours is
    # (O, KH*KW*I).  sigma is permutation-invariant but v is not, so seed torch
    # with OUR u and let both sides iterate from the same u.
    with torch.no_grad():
        tconv.weight_u.copy_(torch.as_tensor(np.asarray(v["spectral"]["u"])))

    for step in range(3):
        got, updates = m.apply(v, jnp.asarray(x), train=True, mutable=["spectral"])
        v = {**v, "spectral": updates["spectral"]}
        tconv.train()
        expect = tconv(torch.as_tensor(nchw(x))).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), nhwc(expect), rtol=1e-3, atol=1e-4)


def test_convblock_nac_and_bottleneck_smoke(rng):
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    blk = ConvBlock("NAC", 6, 6, 3, 1, 1, dim=2)
    v = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y, _ = blk.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    assert y.shape == (2, 8, 8, 6)

    rb = ResBottleneck(6, 8, stride=2)
    v = rb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y, _ = rb.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    assert y.shape == (2, 4, 4, 8)
    assert (np.asarray(y) >= 0).all()  # final relu


def test_down_up_blocks_shapes(rng):
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    db = DownBlock2D(4, 6)
    v = db.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y, _ = db.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    assert y.shape == (2, 4, 4, 6)

    vol = rng.randn(2, 3, 4, 4, 4).astype(np.float32)
    ub = UpBlock3D(4, 2)
    v = ub.init(jax.random.PRNGKey(0), jnp.asarray(vol), train=True)
    y, _ = ub.apply(v, jnp.asarray(vol), train=True, mutable=["batch_stats"])
    assert y.shape == (2, 3, 8, 8, 2)


def test_linear_elr_parity(rng):
    """LinearELR vs a torch oracle re-deriving modules.py:155-223 semantics."""
    import math
    x = rng.randn(3, 8).astype(np.float32)
    for norm, act in [(None, None), ("demod", "leakyrelu"), (None, "relu")]:
        m = LinearELR(8, 5, norm=norm, act=act)
        v = m.init(jax.random.PRNGKey(2), jnp.asarray(x))
        w = torch.as_tensor(np.asarray(v["params"]["weight"]))
        b = torch.as_tensor(np.asarray(v["params"]["bias"]))
        gain = {None: 1.0, "relu": math.sqrt(2.0),
                "leakyrelu": math.sqrt(2.0 / (1.0 + 0.04))}[act]
        if norm == "demod":
            weff = F.normalize(w, dim=1) * gain
        else:
            weff = w * (gain / math.sqrt(8))
        expect = F.linear(torch.as_tensor(x), weff, b)
        if act == "relu":
            expect = F.relu(expect)
        elif act == "leakyrelu":
            expect = F.leaky_relu(expect, 0.2)
        got = np.asarray(m.apply(v, jnp.asarray(x)))
        np.testing.assert_allclose(got, expect.numpy(), rtol=1e-4, atol=1e-5)


def test_mxu_dw_conv_grads_match_xla(rng):
    """The MXU-layout weight-gradient path (_conv_cl_mxu: XLA fwd/dx +
    shift-and-dot dW) must produce the same value and gradients as XLA's
    conv VJP for every shape family the models use: 2D/3D, stride 1 and 2,
    SAME and VALID padding, asymmetric spatial sizes."""
    from facevae_tpu.nn.layers import _conv_cl_mxu, _conv_cl_raw

    cases = [
        # (x_shape, k_spatial, strides, padding)
        ((2, 10, 12, 5), (3, 3), (1, 1), ((1, 1), (1, 1))),
        ((2, 9, 9, 4), (3, 3), (2, 2), ((1, 1), (1, 1))),
        ((2, 12, 12, 6), (7, 7), (1, 1), ((3, 3), (3, 3))),
        ((2, 8, 8, 4), (1, 1), (1, 1), ((0, 0), (0, 0))),
        ((2, 6, 8, 10, 5), (3, 3, 3), (1, 1, 1), ((1, 1), (1, 1), (1, 1))),
        ((2, 6, 8, 8, 4), (3, 3, 3), (1, 2, 2), ((1, 1), (1, 1), (1, 1))),
        ((2, 5, 7, 7, 3), (5, 3, 3), (1, 1, 1), ((2, 2), (0, 0), (1, 1))),
    ]
    for x_shape, ks, st, pd in cases:
        Cout = 7
        x = jnp.asarray(rng.randn(*x_shape).astype(np.float32))
        w = jnp.asarray(
            rng.randn(*ks, x_shape[-1], Cout).astype(np.float32) * 0.1)

        def loss(fn, x, w):
            y = fn(x, w, st, pd)
            # non-uniform cotangent so dx/dW exercise real per-position grads
            return jnp.sum(y * jnp.cos(0.37 * jnp.arange(y.size)
                                       .reshape(y.shape)))

        y_raw = _conv_cl_raw(x, w, st, pd)
        y_mxu = _conv_cl_mxu(x, w, st, pd)
        np.testing.assert_allclose(np.asarray(y_mxu), np.asarray(y_raw),
                                   rtol=1e-5, atol=1e-5)

        gx_raw, gw_raw = jax.grad(lambda a, b: loss(_conv_cl_raw, a, b),
                                  argnums=(0, 1))(x, w)
        gx_mxu, gw_mxu = jax.grad(lambda a, b: loss(_conv_cl_mxu, a, b),
                                  argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_mxu), np.asarray(gx_raw),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_mxu), np.asarray(gw_raw),
                                   rtol=1e-4, atol=1e-4)


def test_mxu_dw_conv_forced_through_layer(rng, monkeypatch):
    """FACEVAE_MXU_DW=1 forces the custom-VJP path on CPU; a Conv layer's
    value and parameter gradients must match the default XLA path."""
    monkeypatch.setenv("FACEVAE_MXU_DW", "0")
    x = jnp.asarray(rng.randn(2, 4, 10, 10, 6).astype(np.float32))
    m = Conv(8, 3, strides=1, padding=1, dim=3)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        y = m.apply({"params": params}, x)
        return jnp.sum(y * jnp.sin(0.11 * jnp.arange(y.size).reshape(y.shape)))

    g_off = jax.grad(loss)(v["params"], x)
    monkeypatch.setenv("FACEVAE_MXU_DW", "1")
    g_on = jax.grad(loss)(v["params"], x)
    for name in ("kernel", "bias"):
        np.testing.assert_allclose(np.asarray(g_on[name]),
                                   np.asarray(g_off[name]),
                                   rtol=1e-4, atol=1e-4)
