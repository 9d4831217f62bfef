"""Model zoo contract tests: shapes at tiny + full config, grad flow, and
param counts in the expected ballpark.

Run at the tiny config for speed; one full-config (256², K=15, D=16) shape
check per model guards the reshape/layout logic.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facevae_tpu.config import ModelConfig, tiny_config
from facevae_tpu.models import build_models
from facevae_tpu.models.hopenet import Hopenet


@pytest.fixture(scope="module")
def tiny():
    return tiny_config()


def _init(model, *args, **kwargs):
    return model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                      *args, **kwargs)


def test_afe(tiny, rng):
    cfg = tiny.model
    m = build_models(cfg)["afe"]
    x = jnp.asarray(rng.rand(2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    v = _init(m, x)
    y, _ = m.apply(v, x, mutable=["batch_stats"])
    assert y.shape == (2, cfg.depth, cfg.image_size // 4, cfg.image_size // 4, cfg.app_channels)


def test_ckd(tiny, rng):
    cfg = tiny.model
    m = build_models(cfg)["ckd"]
    x = jnp.asarray(rng.rand(2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    v = _init(m, x)
    kp, _ = m.apply(v, x, mutable=["batch_stats"])
    assert kp.shape == (2, cfg.num_kp, 3)
    assert bool((jnp.abs(kp) <= 1).all())


def test_hpe_ede(tiny, rng):
    cfg = tiny.model
    m = build_models(cfg)["hpe_ede"]
    x = jnp.asarray(rng.rand(2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    v = _init(m, x)
    (yaw, pitch, roll, t, scale), _ = m.apply(v, x, mutable=["batch_stats"])
    assert yaw.shape == pitch.shape == roll.shape == (2,)
    assert t.shape == (2, 3)
    assert scale.shape == (2, 1, 1, 1)
    # 66-bin expectation bound: |angle| <= 33*3 deg in radians
    assert bool((jnp.abs(yaw) <= 33 * 3 * np.pi / 180 + 1e-5).all())


def test_efe_conv5(tiny, rng):
    cfg = tiny.model
    m = build_models(cfg)["efe"]
    x = jnp.asarray(rng.rand(2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    x_a = jnp.asarray(rng.rand(2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    kp_old = jnp.asarray(rng.rand(2, cfg.num_kp, 3) * 2 - 1, jnp.float32)
    v = _init(m, x, x_a, kp_old, train_vae=False)
    (kp, x_c, x_a_c, (mu, logstd), (x_vae, x_hat)), _ = m.apply(
        v, x, x_a, kp_old, train_vae=False, mutable=["batch_stats"])
    assert kp.shape == (2, cfg.num_kp, 3)
    assert x_c is not None and x_a_c is not None and x_c.shape == x_a_c.shape
    assert mu is None and logstd is None        # deterministic mode (quirk q8)
    assert x_hat.shape[-1] == cfg.efe_down_seq[-1] // 2

    # without augmented input: contrastive features absent
    (kp2, x_c2, x_a_c2, _, _), _ = m.apply(
        v, x, None, kp_old, train_vae=False, mutable=["batch_stats"])
    assert x_c2 is None and x_a_c2 is None
    np.testing.assert_allclose(np.asarray(kp2), np.asarray(kp), rtol=1e-5, atol=1e-6)

    # train_vae mode: returns mu/logstd, consumes noise rng
    (kp3, _, _, (mu3, logstd3), _), _ = m.apply(
        v, x, x_a, kp_old, train_vae=True, mutable=["batch_stats"],
        rngs={"noise": jax.random.PRNGKey(7)})
    assert mu3 is not None and logstd3 is not None
    assert mu3.shape == logstd3.shape


def test_mfe_generator_discriminator(tiny, rng):
    cfg = tiny.model
    models = build_models(cfg)
    N, D, Hq = 2, cfg.depth, cfg.image_size // 4
    fs = jnp.asarray(rng.randn(N, D, Hq, Hq, cfg.app_channels), jnp.float32)
    kp_s = jnp.asarray(rng.rand(N, cfg.num_kp, 3) * 2 - 1, jnp.float32) * 0.5
    kp_d = jnp.asarray(rng.rand(N, cfg.num_kp, 3) * 2 - 1, jnp.float32) * 0.5
    q, _ = np.linalg.qr(rng.randn(N, 3, 3))
    Rs = Rd = jnp.asarray(q, jnp.float32)

    mfe = models["mfe"]
    v = _init(mfe, fs, kp_s, kp_d, Rs, Rd)
    (deformation, occlusion, mask), _ = mfe.apply(v, fs, kp_s, kp_d, Rs, Rd,
                                                  mutable=["batch_stats"])
    assert deformation.shape == (N, D, Hq, Hq, 3)
    assert occlusion.shape == (N, Hq, Hq, 1)
    assert mask.shape == (N, D, Hq, Hq, cfg.num_kp + 1)
    np.testing.assert_allclose(np.asarray(mask.sum(-1)), 1.0, rtol=1e-4)
    assert bool(((occlusion >= 0) & (occlusion <= 1)).all())

    gen = models["generator"]
    vg = _init(gen, fs, deformation, occlusion)
    img, _ = gen.apply(vg, fs, deformation, occlusion,
                       mutable=["batch_stats", "spectral"])
    assert img.shape == (N, cfg.image_size, cfg.image_size, 3)
    assert bool(((img >= 0) & (img <= 1)).all())

    disc = models["discriminator"]
    vd = _init(disc, img, kp_d)
    (logits, feats), _ = disc.apply(vd, img, kp_d, mutable=["spectral"])
    assert logits.shape[0] == N and logits.shape[-1] == 1
    assert len(feats) == len(cfg.disc_down_seq)


def test_full_config_shapes(rng):
    """One forward at the reference config (256², K=15, D=16) through the
    shape-critical reshape paths (AFE + EFE), batch 1."""
    cfg = ModelConfig()
    models = build_models(cfg)
    x = jnp.asarray(rng.rand(1, 256, 256, 3), jnp.float32)
    v = _init(models["afe"], x)
    fs, _ = models["afe"].apply(v, x, mutable=["batch_stats"])
    assert fs.shape == (1, 16, 64, 64, 32)

    kp_old = jnp.asarray(rng.rand(1, 15, 3) * 2 - 1, jnp.float32)
    v = _init(models["efe"], x, None, kp_old)
    (kp, *_), _ = models["efe"].apply(v, x, None, kp_old, mutable=["batch_stats"])
    assert kp.shape == (1, 15, 3)


def test_hopenet(rng):
    m = Hopenet()
    x = jnp.asarray(rng.rand(1, 224, 224, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    yaw, pitch, roll = m.apply(v, x)
    assert yaw.shape == (1,)
    # frozen teacher: no batch_stats mutation in eval
    n_params = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert 20e6 < n_params < 30e6         # ResNet50-scale


def test_grad_flows_through_generator_stack(tiny, rng):
    """End-to-end grad: image -> AFE -> MFE -> Generator -> scalar."""
    cfg = tiny.model
    models = build_models(cfg)
    N = 1
    x = jnp.asarray(rng.rand(N, cfg.image_size, cfg.image_size, 3), jnp.float32)
    kp_s = jnp.asarray(rng.rand(N, cfg.num_kp, 3) * 0.5, jnp.float32)
    kp_d = kp_s + 0.1
    Rs = Rd = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))

    v_afe = _init(models["afe"], x)
    fs0, _ = models["afe"].apply(v_afe, x, mutable=["batch_stats"])
    v_mfe = _init(models["mfe"], fs0, kp_s, kp_d, Rs, Rd)
    d0, o0, _ = models["mfe"].apply(v_mfe, fs0, kp_s, kp_d, Rs, Rd,
                                    mutable=["batch_stats"])[0]
    v_gen = _init(models["generator"], fs0, d0, o0)

    def loss_fn(pa):
        fs, _ = models["afe"].apply({**v_afe, "params": pa}, x, mutable=["batch_stats"])
        dd, oo, _ = models["mfe"].apply(v_mfe, fs, kp_s, kp_d, Rs, Rd,
                                        mutable=["batch_stats"])[0]
        img, _ = models["generator"].apply(v_gen, fs, dd, oo,
                                           mutable=["batch_stats", "spectral"])
        return (img ** 2).mean()

    g = jax.grad(loss_fn)(v_afe["params"])
    gnorm = sum(float(jnp.abs(t).sum()) for t in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_efe_conv6_smoke(rng):
    """Dormant conv6 variant builds and runs at its hardcoded 256² shapes."""
    from facevae_tpu.models.efe_conv6 import EFEConv6
    m = EFEConv6(D=16, K=15)
    x = jnp.asarray(rng.rand(1, 256, 256, 3), jnp.float32)
    kp_old = jnp.asarray(rng.rand(1, 15, 3) * 2 - 1, jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
               x, None, kp_old, train_vae=False)
    (kp, x_c, x_a_c, (mu, logstd), _), _ = m.apply(
        v, x, None, kp_old, train_vae=False, mutable=["batch_stats"])
    assert kp.shape == (1, 15, 3)
    assert mu is not None and logstd is not None    # conv6's VAE always has heads
    assert bool(jnp.isfinite(kp).all())


def test_efe_linear_variants_smoke(rng):
    """Dormant linear variants (reference models.py:82-295) at tiny widths."""
    from facevae_tpu.models.efe_linear import EFELinear
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    x_a = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    kp_old = jnp.asarray(rng.rand(2, 5, 3) * 2 - 1, jnp.float32)

    # "linear": no VAE, contrastive hard-disabled (quirk q2)
    # 64px * 0.25 = 16px -> 4 DownBlocks -> 1x1 spatial -> flat dim 32
    m = EFELinear(variant="linear", down_seq=(3, 8, 16, 24, 32),
                  mid_seq=(32, 16), cat_seq=(16, 16),
                  up_seq=(16, 16), K=5)
    v = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
               x, x_a, kp_old)
    (kp, x_c, x_a_c, (mu, logstd), _), _ = m.apply(
        v, x, x_a, kp_old, mutable=["batch_stats"])
    assert kp.shape == (2, 5, 3) and bool((jnp.abs(kp) <= 1).all())
    assert x_c is None and x_a_c is None and mu is None

    # "lin_conv": linear VAE + contrastive on flat encoder features
    m = EFELinear(variant="lin_conv", down_seq=(3, 8, 16, 24, 32),
                  vae_seq=(32, 64, 64),
                  mid_seq=(32, 32), cat_seq=(32, 32),
                  up_seq=(32, 32), K=5)
    v = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
               x, x_a, kp_old, train_vae=True)
    (kp, x_c, x_a_c, (mu, logstd), _), _ = m.apply(
        v, x, x_a, kp_old, train_vae=True,
        rngs={"noise": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    assert kp.shape == (2, 5, 3)
    assert x_c is not None and x_a_c.shape == x_c.shape
    assert mu is not None and logstd.shape == mu.shape
    assert bool(jnp.isfinite(kp).all())


def test_efe_conv_conv2_smoke(rng):
    """Dormant conv/conv2 variants (reference models.py:297-439)."""
    from facevae_tpu.models.efe import EFEConv
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    x_a = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    kp_old = jnp.asarray(rng.rand(2, 5, 3) * 2 - 1, jnp.float32)

    for variant in ("conv", "conv2"):
        m = EFEConv(variant=variant, down_seq=(3, 8, 16, 24),
                    up_seq=(24, 16, 8, 8), D=4, K=5, n_res=1,
                    contra_seq=(24, 16, 32), use_vae=False)
        v = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                   x, x_a, kp_old)
        (kp, x_c, x_a_c, (mu, logstd), _), _ = m.apply(
            v, x, x_a, kp_old, mutable=["batch_stats"])
        assert kp.shape == (2, 5, 3) and bool((jnp.abs(kp) <= 1).all())
        assert mu is None and logstd is None
        assert x_c is not None and x_a_c is not None
        if variant == "conv":
            assert x_c.ndim == 2        # flattened strided-conv projection
        else:
            assert x_c.ndim == 4        # raw encoder feature map


def test_factory_dispatches_all_variants(tiny):
    """build_models resolves every catalogued efe_variant to the right class
    (the reference selects variants by editing imports, trainer.py:7)."""
    import dataclasses
    from facevae_tpu.models.efe import EFEConv
    from facevae_tpu.models.efe_linear import EFELinear
    for variant, cls in (("conv", EFEConv), ("conv2", EFEConv), ("conv3", EFEConv),
                         ("conv4", EFEConv), ("conv5", EFEConv),
                         ("linear", EFELinear), ("lin_conv", EFELinear)):
        cfg = dataclasses.replace(tiny.model, efe_variant=variant)
        m = build_models(cfg)["efe"]
        assert isinstance(m, cls), variant
        if variant in ("conv", "conv2", "conv3", "conv4", "conv5"):
            assert m.variant == variant
    with pytest.raises(ValueError):
        build_models(dataclasses.replace(tiny.model, efe_variant="nope"))
