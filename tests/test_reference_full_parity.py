"""Whole-objective golden parity: our generator_forward/discriminator_forward
vs the ACTUAL reference GeneratorFull/DiscriminatorFull (trainer.py:214-337),
loss dict entry by entry, on a fixed batch.

The reference's download-time dependencies are satisfied hermetically:
  - torchvision is faked (VGG19/VGG16 archs + resnet.Bottleneck clones in the
    exact torchvision layouts),
  - torch.utils.model_zoo.load_url returns seeded-random state dicts in the
    torchvision-vgg19 / Oxford-vgg_face_dag layouts (losses.py:55-56,80-106),
  - the Hopenet pickle (trainer.py:228-229) is written to disk from a
    seeded-random reference Hopenet.
The same weights flow into our side through tools/convert_torch_weights.py +
losses.pretrained (teachers) and utils_port (models + contrastive head), and
the reference's in-forward Transform noise (trainer.py:270) is replayed into
generator_forward(transform_params=...).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from facevae_tpu.config import Config
from facevae_tpu.ops.tps import TransformParams
from facevae_tpu.train.objective import VarBank, generator_forward, discriminator_forward
from facevae_tpu.train.state import build_all_modules
from facevae_tpu.utils_port import port_torch_to_flax

from test_teacher_conversion import (
    VGG19_CFG, VGG16_CFG, make_torch_vgg_features, TorchBottleneck, _randomize)

pytestmark = pytest.mark.slow

N = 2


class _FakeVGG(tnn.Module):
    """torchvision VGG full-model layout (features + classifier)."""

    def __init__(self, cfg, num_classes=1000):
        super().__init__()
        self.features = make_torch_vgg_features(cfg)
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, num_classes))


def _oxford_vggface_sd(seed):
    """Random state dict in the Oxford vgg_face_dag key layout."""
    torch.manual_seed(seed)
    feats = make_torch_vgg_features(VGG16_CFG)
    sd = _randomize(feats.state_dict(), seed)
    idx2name = {0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
                10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
                17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
                24: "conv5_1", 26: "conv5_2", 28: "conv5_3"}
    out = {}
    for k, v in sd.items():
        i, leaf = int(k.split(".")[0]), k.split(".")[1]
        out[f"{idx2name[i]}.{leaf}"] = v
    for fc, shape in (("fc6", (4096, 25088)), ("fc7", (4096, 4096)),
                      ("fc8", (2622, 4096))):
        out[fc + ".weight"] = torch.randn(shape) * 0.01
        out[fc + ".bias"] = torch.randn(shape[0]) * 0.01
    return out


def make_ref_bundle(tmp):
    """Import reference trainer with faked torchvision + hermetic downloads.

    Module-level (not fixture) so tools/parity_train.py can reuse it.
    """
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    vgg19_sd = _randomize(_FakeVGG(VGG19_CFG).state_dict(), 101)
    vggface_sd = _oxford_vggface_sd(102)

    def fake_load_url(url, *a, **k):
        if "vgg19" in url:
            return vgg19_sd
        return vggface_sd

    fake_tv = types.ModuleType("torchvision")
    fake_models = types.ModuleType("torchvision.models")
    fake_resnet = types.ModuleType("torchvision.models.resnet")
    fake_resnet.Bottleneck = TorchBottleneck
    fake_models.resnet = fake_resnet
    fake_models.vgg19 = lambda **k: _FakeVGG(VGG19_CFG, **k)
    fake_models.vgg16 = lambda num_classes=1000: _FakeVGG(VGG16_CFG, num_classes=num_classes)
    fake_tv.models = fake_models
    for k, v in (("torchvision", fake_tv), ("torchvision.models", fake_models),
                 ("torchvision.models.resnet", fake_resnet)):
        sys.modules[k] = v
    import torch.utils.model_zoo as _mz
    _mz.load_url = fake_load_url

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import trainer as ref_trainer
    import models as ref_models

    # hermetic Hopenet pickle (trainer.py:228-229 loads this path)
    hope = ref_trainer.Hopenet(TorchBottleneck, [3, 4, 6, 3], 66)
    hope_sd = _randomize(hope.state_dict(), 103)
    # BN running_var must be positive or eval-mode rsqrt goes NaN
    hope_sd = {k: (v.abs() + 0.5 if k.endswith("running_var") else v)
               for k, v in hope_sd.items()}
    hopenet_path = tmp / "hopenet_robust_alpha1.pkl"
    torch.save(hope_sd, str(hopenet_path))

    return types.SimpleNamespace(
        trainer=ref_trainer, models=ref_models, tmp=tmp,
        vgg19_sd=vgg19_sd, vggface_sd=vggface_sd, hope_sd=hope_sd,
        hopenet_path=str(hopenet_path))


@pytest.fixture(scope="module")
def ref_bundle(tmp_path_factory):
    return make_ref_bundle(tmp_path_factory.mktemp("refparity"))


def _convert_teachers(ref, out_dir):
    spec = importlib.util.spec_from_file_location(
        "convert_torch_weights", "tools/convert_torch_weights.py")
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    tool.convert_vgg({k: v.numpy() for k, v in ref.vgg19_sd.items()},
                     __import__("facevae_tpu.losses.vgg", fromlist=["VGG19_BLOCKS"]).VGG19_BLOCKS,
                     str(out_dir / "vgg19.npz"),
                     lambda bi, ci: f"features.{tool.VGG19_IDX[(bi, ci)]}"
                     if (bi, ci) in tool.VGG19_IDX else None)
    tool.convert_vgg({k: v.numpy() for k, v in ref.vggface_sd.items()},
                     __import__("facevae_tpu.losses.vgg", fromlist=["VGG16_BLOCKS"]).VGG16_BLOCKS,
                     str(out_dir / "vggface.npz"),
                     lambda bi, ci: tool.VGGFACE_NAMES.get((bi, ci)))
    tool.convert_hopenet({k: v.numpy() for k, v in ref.hope_sd.items()},
                         str(out_dir / "hopenet.npz"))


def make_transform_params(fixed_transform):
    """Convert a pinned reference Transform's noise into our TPS pytree."""
    return TransformParams(
        theta=jnp.asarray(fixed_transform.theta.numpy()),
        # torch keeps control points gridded [1,P,P,2]; our pytree flattens
        control_points=jnp.asarray(
            fixed_transform.control_points.numpy().reshape(1, -1, 2)),
        control_params=jnp.asarray(fixed_transform.control_params.numpy()))


def port_reference_objective(ref, cfg, g_full):
    """Port every weight of the reference GeneratorFull into our modules.

    Returns (models, teachers, parts) where parts carries the banked
    collections (g_params/d_params/c_params/stats/spectral).  Reused by
    tools/parity_train.py.
    """
    # EAGER init: the order-zip port needs creation-ordered variable dicts;
    # create_train_state's jit would re-sort them (see init_all_variables).
    from facevae_tpu.train.state import init_all_variables, G_MODEL_NAMES, D_MODEL_NAMES
    models = build_all_modules(cfg)
    variables = init_all_variables(models, cfg, seed=0)
    from facevae_tpu.losses.pretrained import load_pretrained
    teachers = load_pretrained(
        {"hopenet": variables["hopenet"],
         "perceptual": {"params": variables["perceptual"]["params"]}},
        cfg.loss.pretrained_dir)

    g_params = {n: variables[n]["params"] for n in G_MODEL_NAMES}
    d_params = {n: variables[n]["params"] for n in D_MODEL_NAMES}
    stats = {n: v["batch_stats"] for n, v in variables.items()
             if "batch_stats" in v and n not in ("hopenet", "perceptual")}
    spectral = jax.tree.map(np.asarray,
                            {n: v["spectral"] for n, v in variables.items()
                             if "spectral" in v})
    name2ref = {"efe": g_full.efe, "afe": g_full.afe, "ckd": g_full.ckd,
                "hpe_ede": g_full.hpe_ede, "mfe": g_full.mfe,
                "generator": g_full.generator,
                "discriminator": g_full.discriminator}
    for name, tmod in name2ref.items():
        sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
        tgt = g_params if name in g_params else d_params
        new_p, new_s = port_torch_to_flax(sd, tgt[name], stats.get(name),
                                          spectral=spectral.get(name))
        tgt[name] = new_p
        if new_s is not None:
            stats[name] = new_s

    # contrastive head: torch flattens (C,h,w), we flatten (h,w,C) -> permute
    # the first projector fc's input dim before the order-zip port
    c_sd = {k: v.detach().numpy() for k, v in g_full.losses["C"].state_dict().items()}
    C_, h_, w_ = 32, 4, 4
    w0 = c_sd["projection.0.weight"]
    c_sd["projection.0.weight"] = (w0.reshape(-1, C_, h_, w_)
                                   .transpose(0, 2, 3, 1).reshape(w0.shape))
    c_params, c_stats = port_torch_to_flax(
        c_sd, variables["contrastive"]["params"],
        variables["contrastive"]["batch_stats"])
    stats["contrastive"] = c_stats

    parts = types.SimpleNamespace(g_params=g_params, d_params=d_params,
                                  c_params={"contrastive": c_params},
                                  stats=stats, spectral=spectral)
    return models, teachers, parts


def test_full_objective_parity(ref_bundle):
    ref = ref_bundle
    import dataclasses
    cfg = Config()
    cfg = dataclasses.replace(cfg, loss=dataclasses.replace(
        cfg.loss, pretrained_dir=str(ref.tmp)))
    _convert_teachers(ref, ref.tmp)

    # ---- build the reference objective, eval mode ------------------------
    torch.manual_seed(200)
    g_full = ref.trainer.GeneratorFull(
        ref.models.EFE_conv5(), ref.models.AFE(), ref.models.CKD(),
        ref.models.HPE_EDE(), ref.models.MFE(), ref.models.Generator(),
        ref.models.Discriminator(), pretrained_path=ref.hopenet_path).eval()
    # GeneratorFull.losses is a PLAIN dict (trainer.py:253), so .eval() never
    # reaches the SimSiam head's BatchNorms — put it in eval explicitly to
    # compare running-stat normalization on both sides (our train flag
    # propagates uniformly; the train-mode path is covered by
    # tools/parity_train.py).
    g_full.losses["C"].eval()
    d_full = ref.trainer.DiscriminatorFull(g_full.discriminator).eval()

    # replay the Transform noise: build one fixed Transform and pin it
    torch.manual_seed(201)
    fixed_transform = ref.trainer.Transform(N)
    ref.trainer.Transform = lambda bs: fixed_transform
    tp = make_transform_params(fixed_transform)

    models, teachers, parts = port_reference_objective(ref, cfg, g_full)
    g_params, d_params = parts.g_params, parts.d_params
    stats, spectral = parts.stats, parts.spectral

    bank = VarBank({**g_params, **d_params, **parts.c_params}, stats, spectral)

    # ---- fixed batch ------------------------------------------------------
    torch.manual_seed(202)
    s_t, d_t, sa_t, da_t = (torch.rand(N, 3, 256, 256) for _ in range(4))
    to_j = lambda t: jnp.asarray(np.transpose(t.numpy(), (0, 2, 3, 1)))
    s_j, d_j, sa_j, da_j = map(to_j, (s_t, d_t, sa_t, da_t))

    with torch.no_grad():
        want, want_gen, *_ = g_full(s_t, d_t, sa_t, da_t, train_vae=False)

    losses, aux = generator_forward(
        models, teachers, bank, cfg, s_j, d_j, sa_j, da_j,
        jax.random.PRNGKey(0), train_vae=False, train=False,
        transform_params=tp)

    got = {k: float(v) for k, v in losses.items()}
    expect = {k: float(v) for k, v in want.items()}
    for k in ("P", "G", "F", "E", "L", "H", "D", "C"):
        assert abs(got[k] - expect[k]) <= max(5e-3 * abs(expect[k]), 2e-3), (
            k, got[k], expect[k])
    assert got["K"] == 0.0 and expect["K"] == 0.0
    assert abs(got["R"] - expect["R"]) < 1e-6

    np.testing.assert_allclose(
        np.asarray(aux["generated_d"]),
        np.transpose(want_gen.numpy(), (0, 2, 3, 1)), rtol=5e-3, atol=2e-3)

    # ---- discriminator side (trainer.py:319-337) --------------------------
    kp_d_t = torch.as_tensor(np.asarray(aux["kp_d"]))
    with torch.no_grad():
        want_d = d_full(d_t, want_gen, kp_d_t)
    got_d = discriminator_forward(models, bank, cfg, d_j,
                                  aux["generated_d"], aux["kp_d"], train=False)
    for k in ("G1", "G2"):
        assert abs(float(got_d[k]) - float(want_d[k])) <= \
            max(5e-3 * abs(float(want_d[k])), 2e-3), (k, float(got_d[k]), float(want_d[k]))
