"""Module-level golden parity: our flax models vs torch oracle modules with
weights ported by facevae_tpu.utils_port (the same machinery that converts
reference checkpoints).

The torch oracles re-derive the reference architectures (models.py:922-945
AFE, models.py:1085-1111 Generator) with plain torch layers.  Weights flow
torch -> flax via the order-zip porter; outputs must match at fp32 in eval
mode (BN running stats).
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from torch import nn as tnn
import pytest

from facevae_tpu.config import ModelConfig, tiny_config
from facevae_tpu.models import build_models
from facevae_tpu.utils_port import port_torch_to_flax


class TorchConvBlock(tnn.Module):
    """Reference modules.py:8-42 oracle (pattern CNA/NAC/CN, batch norm)."""

    def __init__(self, pattern, cin, cout, k, s, p, dim=2, norm="batch", act="relu"):
        super().__init__()
        conv = tnn.Conv2d if dim == 2 else tnn.Conv3d
        norm_ch = cout if pattern.find("C") < pattern.find("N") or "N" not in pattern else cin
        layers = []
        for ch in pattern:
            if ch == "C":
                layers.append(conv(cin, cout, k, s, p))
            elif ch == "N":
                bn = tnn.BatchNorm2d if dim == 2 else tnn.BatchNorm3d
                layers.append(bn(norm_ch))
            elif ch == "A":
                layers.append(tnn.ReLU() if act == "relu" else tnn.LeakyReLU(0.2))
        self.layers = tnn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


class TorchAFE(tnn.Module):
    def __init__(self, down_seq=(16, 24, 32), n_res=2, C=8, D=4):
        super().__init__()
        self.in_conv = TorchConvBlock("CNA", 3, down_seq[0], 7, 1, 3)
        downs = []
        for i in range(len(down_seq) - 1):
            downs.append(tnn.Sequential(
                TorchConvBlock("CNA", down_seq[i], down_seq[i + 1], 3, 1, 1),
                tnn.AvgPool2d(2)))
        self.down = tnn.Sequential(*downs)
        self.mid_conv = tnn.Conv2d(down_seq[-1], C * D, 1, 1, 0)
        res = []
        for _ in range(n_res):
            res.append(tnn.Sequential(
                TorchConvBlock("NAC", C, C, 3, 1, 1, dim=3),
                TorchConvBlock("NAC", C, C, 3, 1, 1, dim=3)))
        self.res = tnn.ModuleList(res)
        self.C, self.D = C, D

    def forward(self, x):
        x = self.in_conv(x)
        x = self.down(x)
        x = self.mid_conv(x)
        N, _, H, W = x.shape
        x = x.view(N, self.C, self.D, H, W)
        for blk in self.res:
            x = x + blk(x)
        return x


def test_afe_parity_via_ported_weights(rng):
    cfg = tiny_config().model
    m = build_models(cfg)["afe"]
    x = rng.rand(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))

    oracle = TorchAFE(tuple(cfg.afe_down_seq), cfg.afe_n_res,
                      cfg.app_channels, cfg.depth)
    oracle.eval()
    new_params, new_stats = port_torch_to_flax(
        {k: v_.detach().numpy() for k, v_ in oracle.state_dict().items()},
        v["params"], v["batch_stats"])

    got = m.apply({"params": new_params, "batch_stats": new_stats},
                  jnp.asarray(x), train=False)
    with torch.no_grad():
        expect = oracle(torch.as_tensor(np.transpose(x, (0, 3, 1, 2))))
    # ours NDHWC vs torch NCDHW
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(expect.numpy(), (0, 2, 3, 4, 1)),
                               rtol=1e-3, atol=1e-4)


def test_hopenet_parity_via_ported_weights(rng):
    """Hopenet vs a torchvision-layout ResNet oracle, incl. the fc_finetune
    skip (reference trainer.py:36)."""
    from facevae_tpu.models.hopenet import Hopenet
    try:
        from torchvision.models.resnet import Bottleneck  # not in this env
        have_tv = True
    except Exception:
        have_tv = False
    if not have_tv:
        pytest.skip("torchvision not available; covered by structural tests")
