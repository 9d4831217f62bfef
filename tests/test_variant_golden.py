"""Golden parity for the DORMANT model variants vs the actual reference
(/root/reference/models.py:189-920, losses.py:329-382).

Same machinery as test_reference_golden.py (order-zip weight port,
.cuda() neutralized).  Where the torch ctor order differs from our call
order (a param-bearing VAE created last, EFE_conv's contrastive stack), the
torch state dict is REORDERED by module prefix before the zip — the zip is
strictly order-based (utils_port.port_torch_to_flax).

Upstream-broken variants are pinned by tests that assert the breakage:
  - EFE_conv3: local_vae's 128-ch encoder vs the 256-ch bottleneck
    (models.py:456,598) — channel mismatch at ANY input size.
  - EFE_conv4: calls self.vae(x_vae) without flatten_vae's required
    train_vae arg (models.py:700 vs :509) — TypeError; golden-tested here
    with the evident-intent one-arg patch (train_vae=False).
  - EFE_lin_conv: self.down never assigned (models.py:117-118) — breakage
    asserted, then golden-tested against a minimally-patched reference
    (the one missing `self.down =` assignment supplied, noise zeroed to the
    deterministic-mu mode the rest of the family uses).
"""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from facevae_tpu.models.efe import EFEConv
from facevae_tpu.utils_port import port_torch_to_flax

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models as ref_models
    return ref_models


@pytest.fixture(scope="module")
def ref_losses(ref):
    # reference losses.py imports torchvision at module level (absent here);
    # ContrastiveLoss_conv2 itself never touches it — stub it for the import
    import types
    if "torchvision" not in sys.modules:
        fake_tv = types.ModuleType("torchvision")
        fake_tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = fake_tv
        sys.modules["torchvision.models"] = fake_tv.models
    import losses as ref_losses_mod
    return ref_losses_mod


def _to_nhwc(t):
    a = t.detach().numpy()
    if a.ndim == 4:
        return np.transpose(a, (0, 2, 3, 1))
    if a.ndim == 5:
        return np.transpose(a, (0, 2, 3, 4, 1))
    return a


def reorder_sd(sd, prefix_order):
    """Stable-reorder a torch state dict by module prefix (matching our flax
    call order) so the strictly order-based zip aligns."""
    def rank(key):
        for i, p in enumerate(prefix_order):
            if key == p or key.startswith(p + "."):
                return i
        return len(prefix_order)
    items = sorted(sd.items(), key=lambda kv: rank(kv[0]))
    return dict(items)


def _port(torch_mod, flax_mod, init_args, prefix_order=None, **apply_kw):
    sd = {k: v.detach().numpy() for k, v in torch_mod.state_dict().items()}
    if prefix_order is not None:
        sd = reorder_sd(sd, prefix_order)
    v = flax_mod.init(jax.random.PRNGKey(0), *init_args)
    params, stats = port_torch_to_flax(sd, v["params"], v.get("batch_stats"))
    variables = {"params": params}
    if stats is not None:
        variables["batch_stats"] = stats

    def run(*args, **kw):
        return flax_mod.apply(variables, *args, train=False, **dict(apply_kw, **kw))

    return run


def _imgs(seed, n, size):
    torch.manual_seed(seed)
    x = torch.rand(n, 3, size, size)
    return x, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))


def _kp(seed, n, k=15):
    torch.manual_seed(seed)
    kp = torch.rand(n, k, 3) * 1.2 - 0.6
    return kp, jnp.asarray(kp.numpy())


def test_efe_linear_golden(ref):
    """EFE_linear (models.py:189-295): LinearELR demod stack + NeRF kp
    embedding, tanh kp head; quirk q2 (x_a hard-disabled)."""
    from facevae_tpu.models.efe_linear import EFELinear
    torch.manual_seed(60)
    tm = ref.EFE_linear().eval()
    fm = EFELinear(variant="linear")
    xt, xj = _imgs(61, 2, 256)
    at, aj = _imgs(62, 2, 256)
    kpt, kpj = _kp(63, 2)
    run = _port(tm, fm, (xj, aj, kpj))
    with torch.no_grad():
        kp, x_c, x_a_c, mu, logstd = tm(xt, at, kpt)
    got_kp, got_xc, got_xac, (got_mu, _), _ = run(xj, aj, kpj)
    assert x_c is None and got_xc is None          # quirk q2 preserved
    assert mu is None and got_mu is None           # vae_seq=None default
    np.testing.assert_allclose(np.asarray(got_kp), kp.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_efe_conv2_golden(ref):
    """EFE_conv2 (models.py:371-439): no VAE, contrastive on raw encoder
    maps.  Streams align (no param-bearing vae) -> direct zip.  128² input
    (the ctor's comment geometry; 256² works too but is CPU-heavy)."""
    torch.manual_seed(64)
    tm = ref.EFE_conv2().eval()
    fm = EFEConv(variant="conv2", down_seq=(3, 64, 128, 256),
                 up_seq=(256, 128, 64, 32))
    xt, xj = _imgs(65, 2, 128)
    at, aj = _imgs(66, 2, 128)
    kpt, kpj = _kp(67, 2)
    run = _port(tm, fm, (xj, aj, kpj))
    with torch.no_grad():
        kp, x_c, x_a_c, _, _ = tm(xt, at, kpt)
    got_kp, got_xc, got_xac, _, _ = run(xj, aj, kpj)
    np.testing.assert_allclose(np.asarray(got_kp), kp.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_xc), _to_nhwc(x_c), rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_xac), _to_nhwc(x_a_c), rtol=2e-3, atol=5e-4)


def test_efe_conv_golden(ref):
    """EFE_conv (models.py:297-369): bare strided-conv contrastive stack,
    created LAST in the torch ctor -> reordered zip."""
    torch.manual_seed(68)
    tm = ref.EFE_conv().eval()
    fm = EFEConv(variant="conv", down_seq=(3, 64, 128, 256),
                 up_seq=(256, 128, 64, 32),
                 contra_seq=(256, 512, 1024, 2048))
    xt, xj = _imgs(69, 2, 128)
    at, aj = _imgs(70, 2, 128)
    kpt, kpj = _kp(71, 2)
    run = _port(tm, fm, (xj, aj, kpj),
                prefix_order=["down", "contrastive_conv", "mid_conv", "up",
                              "out_conv", "mix", "mix_out"])
    with torch.no_grad():
        kp, x_c, x_a_c, _, _ = tm(xt, at, kpt)
    got_kp, got_xc, got_xac, _, _ = run(xj, aj, kpj)
    np.testing.assert_allclose(np.asarray(got_kp), kp.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_xc), x_c.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_xac), x_a_c.numpy(), rtol=2e-3, atol=2e-3)


def test_efe_conv4_upstream_break_and_golden(ref):
    """EFE_conv4 (models.py:648-722) is broken upstream: forward calls
    self.vae(x_vae) but flatten_vae.forward requires train_vae (models.py:509).
    Assert the break, then golden-test with the evident-intent one-arg patch
    (train_vae=False — the deterministic-mu mode every other variant uses)."""
    import functools
    torch.manual_seed(72)
    tm = ref.EFE_conv4().eval()
    xt, xj = _imgs(73, 2, 128)
    at, aj = _imgs(74, 2, 128)
    kpt, kpj = _kp(75, 2)
    with pytest.raises(TypeError):
        with torch.no_grad():
            tm(xt, at, kpt)

    tm.vae.forward = functools.partial(type(tm.vae).forward, tm.vae,
                                       train_vae=False)
    fm = EFEConv(variant="conv4", down_seq=(3, 64, 128, 128, 256, 256),
                 up_seq=(256, 256, 128, 128, 64, 32))
    # torch ctor creates the vae LAST; our call order puts it right after the
    # encoder -> reordered zip
    run = _port(tm, fm, (xj, aj, kpj),
                prefix_order=["down", "vae", "mid_conv", "up", "out_conv",
                              "mix", "mix_out"])
    with torch.no_grad():
        kp, x_c, x_a_c, _, _ = tm(xt, at, kpt)
    got_kp, got_xc, got_xac, _, _ = run(xj, aj, kpj)
    np.testing.assert_allclose(np.asarray(got_kp), kp.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_xc), _to_nhwc(x_c), rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_xac), _to_nhwc(x_a_c), rtol=2e-3, atol=5e-4)


def test_efe_lin_conv_upstream_break_and_golden(ref, monkeypatch):
    """EFE_lin_conv (models.py:82-187) is broken upstream: the `encoder()`
    closure builds `down` but never assigns `self.down` (models.py:117-118),
    so forward dies on the first attribute access.  Assert the break, then
    golden-test against a minimally-patched reference: supply the evidently
    intended `self.down = Sequential(DownBlock2D...)` chain, and zero the
    always-on reparameterization noise (models.py:156) to match the
    deterministic-mu mode (train_vae=False) the rest of the family uses.

    Second upstream breakage pinned below: the augmented branch feeds the RAW
    frame to `down` — models.py:148 skips the quarter-scale interpolate the
    clean branch gets (models.py:143) — producing a [N,2048,4,4] x_a_c that
    would crash the 2048-wide contrastive head.  Ours interpolates both
    branches (the evident intent); the golden compares x_a_c against the
    patched reference chain run on the interpolated frame."""
    from facevae_tpu.models.efe_linear import EFELinear, efe_lin_conv_defaults
    torch.manual_seed(90)
    tm = ref.EFE_lin_conv().eval()
    xt, xj = _imgs(91, 2, 256)
    at, aj = _imgs(92, 2, 256)
    kpt, kpj = _kp(93, 2)
    with pytest.raises(AttributeError, match="down"):
        with torch.no_grad():
            tm(xt, at, kpt)

    # the one-line intent fix: models.py:117-118 builds exactly this chain
    seq = (3, 64, 128, 256, 512, 1024, 2048)
    torch.manual_seed(94)
    tm.down = torch.nn.Sequential(
        *[ref.DownBlock2D(seq[i], seq[i + 1], False)
          for i in range(len(seq) - 1)]).eval()
    # zero the unconditional reparameterization draw -> x_z == mu
    monkeypatch.setattr(torch, "randn",
                        lambda *size, **kw: torch.zeros(*size, **kw))

    fm = EFELinear(**efe_lin_conv_defaults())
    # torch ctor order puts the (post-hoc) down chain LAST; our call order
    # runs it first -> reordered zip
    run = _port(tm, fm, (xj, aj, kpj),
                prefix_order=["down", "vae_encoder", "mu", "logstd",
                              "mid_map", "mid_cat", "up", "final_linear"])
    with torch.no_grad():
        kp, x_c, x_a_c, mu, logstd = tm(xt, at, kpt)
        # pin breakage #2: un-interpolated augmented branch keeps 4x4 spatial
        assert x_a_c.shape == (2, 2048, 4, 4)
        want_xac = tm.down(torch.nn.functional.interpolate(
            at, mode="bilinear", scale_factor=0.25, align_corners=False,
            recompute_scale_factor=True)).squeeze(-1).squeeze(-1)
    got_kp, got_xc, got_xac, (got_mu, got_logstd), _ = run(xj, aj, kpj)
    np.testing.assert_allclose(np.asarray(got_kp), kp.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_xc), x_c.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_xac), want_xac.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_mu), mu.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_logstd), logstd.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_efe_conv3_upstream_break(ref):
    """EFE_conv3 (models.py:573-645) is broken upstream at ANY input size:
    its 256-ch bottleneck feeds local_vae's DownBlock2D(128,128) encoder
    (models.py:456,598).  Pin the breakage; our variant builds the evident
    intent (LocalVAE sized to the actual bottleneck) and is smoke-tested in
    test_models.py."""
    torch.manual_seed(76)
    tm = ref.EFE_conv3().eval()
    for size in (128, 256):
        xt, _ = _imgs(77, 1, size)
        kpt, _ = _kp(78, 1)
        with pytest.raises(RuntimeError, match="channels"):
            with torch.no_grad():
                tm(xt, None, kpt)


def test_efe_conv6_golden(ref):
    """EFE_conv6 + flatten_vae6 (models.py:802-920): Conv2dELR encoder,
    kp-heatmap ConvBlock3D pyramid fused into ConvTranspose3dELR decoders via
    skip-adds.  Torch ctor order (kpc encoders before mid_conv, vae last)
    differs from call order -> reordered zip.  256²-only, as upstream."""
    torch.manual_seed(80)
    tm = ref.EFE_conv6().eval()
    from facevae_tpu.models.efe_conv6 import EFEConv6
    fm = EFEConv6()
    xt, xj = _imgs(81, 1, 256)
    at, aj = _imgs(82, 1, 256)
    kpt, kpj = _kp(83, 1)
    # vae sub-order matters: torch ctor is [encoder, decoder, mu, logstd]
    # (models.py:816-819) but the call order is enc -> mu -> logstd -> dec,
    # and all four are same-shaped LinearELRs (a coarse 'vae' prefix would
    # zip them silently crossed)
    run = _port(tm, fm, (xj, aj, kpj),
                prefix_order=["efe_encoder", "vae.encoder", "vae.mu_fc",
                              "vae.logstd_fc", "vae.decoder", "mid_conv",
                              "kpc_encoder_64", "kpc_encoder_32",
                              "kpc_encoder_16", "kpc_encoder_8",
                              "efe_decoder8", "efe_decoder16",
                              "efe_decoder32", "efe_decoder64", "efe_out"])
    with torch.no_grad():
        kp, x_c, x_a_c, (mu, logstd), _ = tm(xt, at, kpt)
    got_kp, got_xc, got_xac, (got_mu, got_logstd), _ = run(xj, aj, kpj)
    np.testing.assert_allclose(np.asarray(got_kp), kp.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_xc), _to_nhwc(x_c), rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_xac), _to_nhwc(x_a_c), rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_mu), mu.numpy(), rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_logstd), logstd.numpy(),
                               rtol=2e-3, atol=1e-3)


def test_contrastive_conv2_golden(ref_losses):
    """ContrastiveLoss_conv2 non-direction (losses.py:329-382): strided
    conv+BN(affine=False) projector + MLP predictor, symmetric neg-cosine."""
    from facevae_tpu.losses.contrastive import ContrastiveHeadConv2
    torch.manual_seed(84)
    tm = ref_losses.ContrastiveLoss_conv2(mode="non-direction").eval()
    fm = ContrastiveHeadConv2()
    torch.manual_seed(85)
    f1 = torch.rand(4, 256, 4, 4)
    f2 = torch.rand(4, 256, 4, 4)
    f1j = jnp.asarray(np.transpose(f1.numpy(), (0, 2, 3, 1)))
    f2j = jnp.asarray(np.transpose(f2.numpy(), (0, 2, 3, 1)))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    v = fm.init(jax.random.PRNGKey(0), f1j, f2j)
    params, stats = port_torch_to_flax(sd, v["params"], v.get("batch_stats"))
    variables = {"params": params}
    if stats is not None:
        variables["batch_stats"] = stats
    with torch.no_grad():
        want = tm(f1, f2)
    got = fm.apply(variables, f1j, f2j, train=False)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4, atol=1e-5)
