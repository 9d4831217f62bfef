"""Golden parity vs the ACTUAL reference code (/root/reference/models.py).

The reference modules are imported with their `.cuda()` hardcodes
(utils.py:82,94,144, models.py:1014) monkeypatched to identity, weights are
ported torch->flax by facevae_tpu.utils_port (the same machinery as
tools/convert_reference_checkpoint.py), and outputs must match at fp32.

Covers every active net (SURVEY.md §2.2): AFE, CKD, HPE_EDE, EFE_conv5
(+flatten_vae_nl), MFE, Generator (spectral norm, 3D warp), Discriminator —
in eval mode, plus a train-mode check (batch stats + power iteration).
"""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from facevae_tpu.config import ModelConfig
from facevae_tpu.models import build_models
from facevae_tpu.utils_port import port_torch_to_flax

pytestmark = pytest.mark.slow

N = 2


@pytest.fixture(scope="module")
def ref():
    """Import the reference with .cuda() neutralized (quirk q6)."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models as ref_models
    return ref_models


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig()          # full 256² / K=15 / D=16 flagship config


def _to_nhwc(t):
    a = t.detach().numpy()
    if a.ndim == 4:
        return np.transpose(a, (0, 2, 3, 1))
    if a.ndim == 5:
        return np.transpose(a, (0, 2, 3, 4, 1))
    return a


def _port(torch_mod, flax_mod, init_args, train=False, rtol=2e-3, atol=2e-4,
          extra_vars=None):
    """Port weights and return a callable running the flax module."""
    sd = {k: v.detach().numpy() for k, v in torch_mod.state_dict().items()}
    v = flax_mod.init(jax.random.PRNGKey(0), *init_args)
    spectral = jax.tree.map(np.asarray, v["spectral"]) if "spectral" in v else None
    params, stats = port_torch_to_flax(sd, v["params"], v.get("batch_stats"),
                                       spectral=spectral)
    variables = {"params": params}
    if stats is not None:
        variables["batch_stats"] = stats
    if spectral is not None:
        variables["spectral"] = spectral

    def run(*args, **kw):
        mutable = [c for c in ("batch_stats", "spectral") if c in variables] if train else False
        out = flax_mod.apply(variables, *args, train=train, mutable=mutable, **kw)
        return out[0] if train and mutable else out

    return run


def _imgs(seed=0, n=N, size=256):
    torch.manual_seed(seed)
    x = torch.rand(n, 3, size, size)
    return x, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))


def _kp(seed=1, n=N, k=15):
    torch.manual_seed(seed)
    kp = torch.rand(n, k, 3) * 1.2 - 0.6
    return kp, jnp.asarray(kp.numpy())


def test_afe_golden(ref, cfg):
    torch.manual_seed(42)
    tm = ref.AFE().eval()
    fm = build_models(cfg)["afe"]
    xt, xj = _imgs()
    run = _port(tm, fm, (xj,))
    with torch.no_grad():
        want = tm(xt)
    np.testing.assert_allclose(np.asarray(run(xj)), _to_nhwc(want),
                               rtol=2e-3, atol=2e-4)


def test_ckd_golden(ref, cfg):
    torch.manual_seed(43)
    tm = ref.CKD().eval()
    fm = build_models(cfg)["ckd"]
    xt, xj = _imgs(1)
    run = _port(tm, fm, (xj,))
    with torch.no_grad():
        want = tm(xt)                        # [N,K,3] keypoints
    np.testing.assert_allclose(np.asarray(run(xj)), want.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_hpe_ede_golden(ref, cfg):
    torch.manual_seed(44)
    tm = ref.HPE_EDE().eval()
    fm = build_models(cfg)["hpe_ede"]
    xt, xj = _imgs(2)
    run = _port(tm, fm, (xj,))
    with torch.no_grad():
        want = tm(xt)                        # yaw,pitch,roll,t,scale
    got = run(xj)
    for g, w, name in zip(got, want, ("yaw", "pitch", "roll", "t", "scale")):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_efe_conv5_golden(ref, cfg):
    torch.manual_seed(45)
    tm = ref.EFE_conv5().eval()
    fm = build_models(cfg)["efe"]
    xt, xj = _imgs(3)
    at, aj = _imgs(4)
    kpt, kpj = _kp(5)
    run = _port(tm, fm, (xj, aj, kpj))
    with torch.no_grad():
        # train_vae=False: the VAE runs in deterministic-mu mode (quirk q8),
        # so kp is a deterministic function of the ported weights
        kp, x_c, x_a_c, _, _ = tm(xt, at, kpt, train_vae=False)
    got_kp, got_xc, got_xac, _, _ = run(xj, aj, kpj, train_vae=False)
    np.testing.assert_allclose(np.asarray(got_kp), kp.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_xc), _to_nhwc(x_c),
                               rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_xac), _to_nhwc(x_a_c),
                               rtol=2e-3, atol=5e-4)


def test_mfe_golden(ref, cfg):
    torch.manual_seed(46)
    tm = ref.MFE().eval()
    fm = build_models(cfg)["mfe"]
    torch.manual_seed(6)
    fs_t = torch.rand(N, 32, 16, 64, 64)
    fs_j = jnp.asarray(np.transpose(fs_t.numpy(), (0, 2, 3, 4, 1)))
    kps_t, kps_j = _kp(7)
    kpd_t, kpd_j = _kp(8)
    # random rotations: use transform_kp-free orthonormal-ish matrices
    torch.manual_seed(9)
    Rs_t = torch.linalg.qr(torch.randn(N, 3, 3))[0]
    Rd_t = torch.linalg.qr(torch.randn(N, 3, 3))[0]
    Rs_j, Rd_j = jnp.asarray(Rs_t.numpy()), jnp.asarray(Rd_t.numpy())

    run = _port(tm, fm, (fs_j, kps_j, kpd_j, Rs_j, Rd_j))
    with torch.no_grad():
        want_def, want_occ, want_mask = tm(fs_t, kps_t, kpd_t, Rs_t, Rd_t)
    got_def, got_occ, got_mask = run(fs_j, kps_j, kpd_j, Rs_j, Rd_j)
    np.testing.assert_allclose(np.asarray(got_def), want_def.numpy(),
                               rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_occ), _to_nhwc(want_occ),
                               rtol=2e-3, atol=5e-4)
    # torch mask [N,K+1,D,H,W,1] vs ours [N,D,H,W,K+1]
    np.testing.assert_allclose(
        np.asarray(got_mask),
        np.transpose(want_mask.numpy()[..., 0], (0, 2, 3, 4, 1)),
        rtol=2e-3, atol=5e-4)


@pytest.mark.parametrize("train", [False, True])
def test_generator_golden(ref, cfg, train):
    torch.manual_seed(47)
    tm = ref.Generator()                     # spectral norm active
    tm.train(train)
    fm = build_models(cfg)["generator"]
    torch.manual_seed(10)
    fs_t = torch.rand(N, 32, 16, 64, 64)
    def_t = torch.rand(N, 16, 64, 64, 3) * 1.6 - 0.8
    occ_t = torch.rand(N, 1, 64, 64)
    fs_j = jnp.asarray(np.transpose(fs_t.numpy(), (0, 2, 3, 4, 1)))
    def_j = jnp.asarray(def_t.numpy())
    occ_j = jnp.asarray(np.transpose(occ_t.numpy(), (0, 2, 3, 1)))
    run = _port(tm, fm, (fs_j, def_j, occ_j), train=train)
    with torch.no_grad():
        want = tm(fs_t, def_t, occ_t)
    got = run(fs_j, def_j, occ_j)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(want),
                               rtol=2e-3, atol=1e-3)


def test_discriminator_golden(ref, cfg):
    torch.manual_seed(48)
    tm = ref.Discriminator().eval()
    fm = build_models(cfg)["discriminator"]
    xt, xj = _imgs(11)
    kpt, kpj = _kp(12)
    run = _port(tm, fm, (xj, kpj))
    with torch.no_grad():
        want_out, want_feats = tm(xt, kpt)
    got_out, got_feats = run(xj, kpj)
    np.testing.assert_allclose(np.asarray(got_out), _to_nhwc(want_out),
                               rtol=2e-3, atol=1e-3)
    assert len(got_feats) == len(want_feats)
    for g, w in zip(got_feats, want_feats):
        np.testing.assert_allclose(np.asarray(g), _to_nhwc(w),
                                   rtol=2e-3, atol=1e-3)
