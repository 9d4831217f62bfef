#!/usr/bin/env python
"""Conditioning probe for the step-0 gradient-norm comparison in
tools/parity_train.py.

Computes the reference stack's per-submodel gradient norms twice IN TORCH
ALONE: once at the ported weights, once with every weight perturbed by a
relative 1e-6.  If a 1e-6 weight perturbation moves a submodel's gradient
norm by tens of percent, then cross-implementation deltas of that size are
conditioning (chaotic soft-argmax/softmax gradients at random init), not
backward bugs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import pathlib
import tempfile

import torch

from test_reference_full_parity import make_ref_bundle


def grad_norms(g_full, g_models, batch):
    for m in g_models.values():
        m.zero_grad()
    losses, *_ = g_full(*batch, False)
    sum(losses.values()).backward()
    out = {}
    for k, m in g_models.items():
        out[k] = float(torch.sqrt(sum((p.grad ** 2).sum()
                                      for p in m.parameters()
                                      if p.grad is not None)))
    return out


def main():
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="grad_probe_"))
    ref = make_ref_bundle(tmp)
    torch.manual_seed(300)
    g_full = ref.trainer.GeneratorFull(
        ref.models.EFE_conv5(), ref.models.AFE(), ref.models.CKD(),
        ref.models.HPE_EDE(), ref.models.MFE(), ref.models.Generator(),
        ref.models.Discriminator(), pretrained_path=ref.hopenet_path).train()
    g_models = {"efe": g_full.efe, "afe": g_full.afe, "ckd": g_full.ckd,
                "hpe_ede": g_full.hpe_ede, "mfe": g_full.mfe,
                "generator": g_full.generator}

    torch.manual_seed(2000)
    fixed_transform = ref.trainer.Transform(2)
    ref.trainer.Transform = lambda bs: fixed_transform

    batch = [torch.rand(2, 3, 256, 256,
                        generator=torch.Generator().manual_seed(1000 + j))
             for j in range(4)]

    base = grad_norms(g_full, g_models, batch)

    with torch.no_grad():
        for m in g_models.values():
            for p in m.parameters():
                p.mul_(1.0 + 1e-6)

    pert = grad_norms(g_full, g_models, batch)

    print(f"{'model':12s} {'base':>14s} {'x(1+1e-6)':>14s} {'rel change':>11s}")
    for k in g_models:
        rel = abs(pert[k] - base[k]) / max(base[k], 1e-9)
        print(f"{k:12s} {base[k]:14.3f} {pert[k]:14.3f} {rel:10.2%}")


if __name__ == "__main__":
    main()
