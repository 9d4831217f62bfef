"""Teacher-weight pipeline round-trip (VGG19 / VGG-Face / Hopenet).

Synthesizes torch state dicts in the EXACT layouts the reference downloads
(torchvision vgg19 'features.N.*' keys — losses.py:55-56; the Oxford
vgg_face_dag 'convX_Y.*'/'fcN.*' keys that losses.py:80-106 remaps; a
torchvision-style Hopenet ResNet50 state dict — trainer.py:16-88), runs them
through tools/convert_torch_weights.py, loads the .npz artifacts via
losses.pretrained.load_pretrained, and asserts our flax teachers reproduce
the torch oracles' features/angles at fp32.
"""
import importlib.util
import math
import sys

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "convert_torch_weights", "tools/convert_torch_weights.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# torch oracles in the exact torchvision layouts
# ---------------------------------------------------------------------------

VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")


def make_torch_vgg_features(cfg):
    """torchvision.models.vgg make_layers clone: conv(3pad1)->relu, M->maxpool."""
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(cin, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            cin = v
    return tnn.Sequential(*layers)


def run_torch_taps(features, x, tap_indices):
    outs = {}
    with torch.no_grad():
        for i, layer in enumerate(features):
            x = layer(x)
            if i in tap_indices:
                outs[tap_indices[i]] = x.numpy()
    return outs


class TorchBottleneck(tnn.Module):
    """torchvision Bottleneck clone (state-dict-key compatible)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


@pytest.fixture(scope="module")
def ref_hopenet():
    """The ACTUAL reference Hopenet (trainer.py:16-88) with a stand-in
    torchvision module (only resnet.Bottleneck is consumed)."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import types
    fake_tv = types.ModuleType("torchvision")
    fake_models = types.ModuleType("torchvision.models")
    fake_resnet = types.ModuleType("torchvision.models.resnet")
    fake_resnet.Bottleneck = TorchBottleneck
    fake_models.resnet = fake_resnet
    fake_tv.models = fake_models
    saved = {k: sys.modules.get(k) for k in
             ("torchvision", "torchvision.models", "torchvision.models.resnet")}
    sys.modules["torchvision"] = fake_tv
    sys.modules["torchvision.models"] = fake_models
    sys.modules["torchvision.models.resnet"] = fake_resnet
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import trainer as ref_trainer
    yield ref_trainer
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def _randomize(sd, seed):
    torch.manual_seed(seed)
    return {k: torch.randn_like(v) * 0.05 if v.dtype.is_floating_point else v
            for k, v in sd.items()}


def test_vgg19_roundtrip(tmp_path):
    tool = _load_tool()
    from facevae_tpu.losses.vgg import VGGFeatures, VGG19_BLOCKS

    features = make_torch_vgg_features(VGG19_CFG).eval()
    sd = _randomize(features.state_dict(), 1)
    features.load_state_dict(sd)
    # torchvision layout: the full model prefixes these with 'features.'
    full_sd = {"features." + k: v.numpy() for k, v in sd.items()}

    out = tmp_path / "vgg19.npz"
    tool.convert_vgg(full_sd, VGG19_BLOCKS, str(out),
                     lambda bi, ci: f"features.{tool.VGG19_IDX[(bi, ci)]}"
                     if (bi, ci) in tool.VGG19_IDX else None)

    m = VGGFeatures(VGG19_BLOCKS)
    torch.manual_seed(2)
    x = torch.randn(2, 3, 64, 64)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    v = m.init(jax.random.PRNGKey(0), xj)
    params = jax.tree.map(np.asarray, v["params"])
    data = np.load(out)
    for key in data.files:
        mod, leaf = key.split("/")
        assert params[mod][leaf].shape == data[key].shape, key
        params[mod][leaf] = data[key]

    got = m.apply({"params": params}, xj)
    # torchvision feature indices of the relu after conv_i_1
    taps = {1: "relu_1_1", 6: "relu_2_1", 11: "relu_3_1", 20: "relu_4_1",
            29: "relu_5_1"}
    want = run_torch_taps(features, x, taps)
    for name in taps.values():
        np.testing.assert_allclose(
            np.asarray(got[name]), np.transpose(want[name], (0, 2, 3, 1)),
            rtol=2e-3, atol=1e-3, err_msg=name)


def test_vggface_oxford_remap_roundtrip(tmp_path):
    """The Oxford vgg_face_dag layout names layers conv1_1/fc6/... —
    reference losses.py:80-106 remaps them; our converter reads them directly."""
    tool = _load_tool()
    from facevae_tpu.losses.vgg import VGGFeatures, VGG16_BLOCKS

    features = make_torch_vgg_features(VGG16_CFG).eval()
    sd = _randomize(features.state_dict(), 3)
    features.load_state_dict(sd)
    # build the Oxford key naming: conv{block}_{i}.weight/.bias + fc6/7/8
    idx2name = {0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
                10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
                17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
                24: "conv5_1", 26: "conv5_2", 28: "conv5_3"}
    oxford_sd = {}
    for k, v in sd.items():
        i, leaf = int(k.split(".")[0]), k.split(".")[1]
        oxford_sd[f"{idx2name[i]}.{leaf}"] = v.numpy()
    torch.manual_seed(4)
    for fc, shape in (("fc6", (4096, 25088)), ("fc7", (4096, 4096)),
                      ("fc8", (2622, 4096))):
        oxford_sd[fc + ".weight"] = torch.randn(shape).numpy()
        oxford_sd[fc + ".bias"] = torch.randn(shape[0]).numpy()

    out = tmp_path / "vggface.npz"
    tool.convert_vgg(oxford_sd, VGG16_BLOCKS, str(out),
                     lambda bi, ci: tool.VGGFACE_NAMES.get((bi, ci)))

    m = VGGFeatures(VGG16_BLOCKS)
    torch.manual_seed(5)
    x = torch.randn(2, 3, 64, 64)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    v = m.init(jax.random.PRNGKey(0), xj)
    params = jax.tree.map(np.asarray, v["params"])
    data = np.load(out)
    for key in data.files:
        mod, leaf = key.split("/")
        params[mod][leaf] = data[key]

    got = m.apply({"params": params}, xj)
    taps = {1: "relu_1_1", 6: "relu_2_1", 11: "relu_3_1", 18: "relu_4_1",
            25: "relu_5_1"}
    want = run_torch_taps(features, x, taps)
    for name in taps.values():
        np.testing.assert_allclose(
            np.asarray(got[name]), np.transpose(want[name], (0, 2, 3, 1)),
            rtol=2e-3, atol=1e-3, err_msg=name)


def test_hopenet_pickle_roundtrip(tmp_path, ref_hopenet):
    """Reference Hopenet (incl. the vestigial fc_finetune in its state dict,
    trainer.py:36) -> convert_hopenet npz -> our flax Hopenet: same angles."""
    tool = _load_tool()
    from facevae_tpu.models.hopenet import Hopenet

    oracle = ref_hopenet.Hopenet(TorchBottleneck, [3, 4, 6, 3], 66).eval()
    sd = _randomize(oracle.state_dict(), 6)
    oracle.load_state_dict(sd)
    assert any(k.startswith("fc_finetune") for k in sd)   # layout includes it

    out = tmp_path / "hopenet.npz"
    tool.convert_hopenet({k: v.numpy() for k, v in sd.items()}, str(out))

    m = Hopenet()
    torch.manual_seed(7)
    x = torch.randn(2, 3, 224, 224)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    v = m.init(jax.random.PRNGKey(0), xj)
    variables = {"params": jax.tree.map(np.asarray, v["params"]),
                 "batch_stats": jax.tree.map(np.asarray, v["batch_stats"])}
    data = np.load(out)
    for key in data.files:
        parts = key.split("/")
        node = variables[parts[0]]
        for p in parts[1:-1]:
            node = node[p]
        assert node[parts[-1]].shape == data[key].shape, key
        node[parts[-1]] = data[key]

    with torch.no_grad():
        want = oracle(x)
    got = m.apply(variables, xj, train=False)
    for g, w, name in zip(got, want, ("yaw", "pitch", "roll")):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_fetch_teachers_e2e(tmp_path, ref_hopenet):
    """The teacher-weight runbook command (tools/fetch_teachers.py): cached
    torch files in the REAL download layouts -> structural checks -> convert
    -> load into real teacher trees.  Download gating itself is exercised by
    running with no --allow-download (files pre-placed, nothing fetched)."""
    import importlib.util as ilu
    spec = ilu.spec_from_file_location("fetch_teachers", "tools/fetch_teachers.py")
    ft = ilu.module_from_spec(spec)
    spec.loader.exec_module(ft)

    cache = tmp_path / "cache"
    out = tmp_path / "artifacts"
    cache.mkdir()

    # torchvision vgg19 full checkpoint (features.* + classifier.*)
    features = make_torch_vgg_features(VGG19_CFG)
    sd = _randomize(features.state_dict(), 11)
    full = {"features." + k: v for k, v in sd.items()}
    torch.manual_seed(12)
    for i, shape in ((0, (4096, 25088)), (3, (4096, 4096)), (6, (1000, 4096))):
        full[f"classifier.{i}.weight"] = torch.randn(shape) * 0.01
        full[f"classifier.{i}.bias"] = torch.randn(shape[0]) * 0.01
    torch.save(full, cache / "vgg19-dcbb9e9d.pth")

    # Oxford vgg_face_dag checkpoint (convX_Y.* + fc6/7/8.*)
    f16 = make_torch_vgg_features(VGG16_CFG)
    sd16 = _randomize(f16.state_dict(), 13)
    idx2name = {0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
                10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
                17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
                24: "conv5_1", 26: "conv5_2", 28: "conv5_3"}
    oxford = {f"{idx2name[int(k.split('.')[0])]}.{k.split('.')[1]}": v
              for k, v in sd16.items()}
    for fc, shape in (("fc6", (4096, 25088)), ("fc7", (4096, 4096)),
                      ("fc8", (2622, 4096))):
        oxford[fc + ".weight"] = torch.randn(shape) * 0.01
        oxford[fc + ".bias"] = torch.randn(shape[0]) * 0.01
    torch.save(oxford, cache / "vgg_face_dag.pth")

    # Hopenet pickle (reference architecture incl. fc_finetune)
    oracle = ref_hopenet.Hopenet(TorchBottleneck, [3, 4, 6, 3], 66)
    torch.save(_randomize(oracle.state_dict(), 14), cache / "hopenet_robust_alpha1.pkl")

    ft.main(["--cache-dir", str(cache), "--out", str(out), "--no-verify-hash"])
    for name in ("vgg19", "vggface", "hopenet"):
        assert (out / f"{name}.npz").exists(), name


def test_load_pretrained_wires_teachers(tmp_path):
    """End-to-end: artifacts in a dir -> LossConfig.pretrained_dir -> teachers
    in the train state actually carry the converted weights."""
    tool = _load_tool()
    from facevae_tpu.losses.vgg import VGG19_BLOCKS
    from facevae_tpu.losses.pretrained import load_pretrained
    from facevae_tpu.losses import PerceptualLoss
    from facevae_tpu.models.hopenet import Hopenet

    features = make_torch_vgg_features(VGG19_CFG)
    sd = _randomize(features.state_dict(), 8)
    full_sd = {"features." + k: v.numpy() for k, v in sd.items()}
    tool.convert_vgg(full_sd, VGG19_BLOCKS, str(tmp_path / "vgg19.npz"),
                     lambda bi, ci: f"features.{tool.VGG19_IDX[(bi, ci)]}"
                     if (bi, ci) in tool.VGG19_IDX else None)

    x64 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pl_mod = PerceptualLoss(n_scales=1)
    hn_mod = Hopenet()
    teachers = {
        "perceptual": jax.tree.map(np.asarray,
                                   pl_mod.init(jax.random.PRNGKey(0), x64, x64)),
        "hopenet": jax.tree.map(np.asarray, hn_mod.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 3), jnp.float32))),
    }
    before = np.asarray(teachers["perceptual"]["params"]["vgg19"]["conv1_1"]["kernel"]).copy()
    new_teachers = load_pretrained(teachers, str(tmp_path))
    after = np.asarray(new_teachers["perceptual"]["params"]["vgg19"]["conv1_1"]["kernel"])
    assert not np.allclose(before, after)
    expect = np.transpose(full_sd["features.0.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(after, expect, rtol=1e-6, atol=1e-7)
