#!/usr/bin/env python
"""fp64 ground-truth probe for the post-step parity drift (PARITY.md).

Question: is the torch-vs-ours per-step drift on the soft-argmax losses
(E/L/D/H, up to ~65% by step 4) a real backward bug or chaotic fp32
conditioning at random init?

Decisive design — run THREE stacks from identical ported weights, identical
data, identical Transform noise, real Adam steps:

  t64:  the ACTUAL reference stack (torch) in FLOAT64 — ground truth
  t32:  the same reference stack in float32
  ours: our stack (fp32, as shipped)

t32 differs from t64 ONLY by rounding: its per-step drift from t64 is the
intrinsic fp32 chaos of this training system, with zero implementation
ambiguity.  If ours-vs-t64 drift is the same order as t32-vs-t64 drift, our
fp32 stack is as close to the fp64 reference as the fp32 reference itself —
the chaotic-conditioning explanation is proven and no backward bug exists.
If ours-vs-t64 were systematically larger, there would be a real bug.

(A full fp64 port of our stack would require dislodging ~166 deliberate fp32
casts in the TPU compute path; this three-way design answers the same
question without perturbing shipped code.)

Usage: python tools/parity_fp64_probe.py [steps=5]
Appends its table to PARITY.md.
"""
import contextlib
import copy
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")

from facevae_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

N = 2
KEYS_G = ("P", "G", "F", "E", "L", "H", "D", "C", "K", "R")
KEYS_D = ("G1", "G2")


@contextlib.contextmanager
def default_dtype(dt):
    old = torch.get_default_dtype()
    torch.set_default_dtype(dt)
    try:
        yield
    finally:
        torch.set_default_dtype(old)


def torch_step(ref, g_full, d_full, g_opts, d_opt, batch, fixed_transform, dt):
    s_t, d_t, sa_t, da_t = batch
    with default_dtype(dt):
        saved = ref.trainer.Transform
        ref.trainer.Transform = lambda bs: fixed_transform
        try:
            for o in g_opts.values():
                o.zero_grad()
            losses_g, generated_d, _td, _kps, kp_d, *_rest = g_full(
                s_t, d_t, sa_t, da_t, False)
            sum(losses_g.values()).backward()
            for o in g_opts.values():
                o.step()
                o.zero_grad()
            d_opt.zero_grad()
            losses_d = d_full(d_t, generated_d, kp_d)
            sum(losses_d.values()).backward()
            d_opt.step()
            d_opt.zero_grad()
        finally:
            ref.trainer.Transform = saved
    return losses_g, losses_d


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import dataclasses
    import pathlib
    import tempfile

    from test_reference_full_parity import (
        make_ref_bundle, make_transform_params, port_reference_objective,
        _convert_teachers)
    from facevae_tpu.config import Config
    from facevae_tpu.train.state import TrainState, make_optimizers
    from facevae_tpu.train.step import make_train_step

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="parity_fp64_"))
    ref = make_ref_bundle(tmp)
    cfg = Config()
    cfg = dataclasses.replace(cfg, loss=dataclasses.replace(
        cfg.loss, pretrained_dir=str(tmp)))
    _convert_teachers(ref, tmp)

    def build_stack():
        # deterministic given the seed — construction IS the copy mechanism
        # (deepcopy chokes on the jit-scripted loss internals)
        torch.manual_seed(300)       # same init as tools/parity_train.py
        g = ref.trainer.GeneratorFull(
            ref.models.EFE_conv5(), ref.models.AFE(), ref.models.CKD(),
            ref.models.HPE_EDE(), ref.models.MFE(), ref.models.Generator(),
            ref.models.Discriminator(), pretrained_path=ref.hopenet_path).train()
        return g, ref.trainer.DiscriminatorFull(g.discriminator).train()

    g32, d32 = build_stack()
    g64, d64 = build_stack()
    g64.double()
    # GeneratorFull keeps its loss modules in a PLAIN dict (trainer.py:253) —
    # they are not registered submodules, so .double() misses the VGG
    # teachers / contrastive head inside them
    for m in g64.losses.values():
        if isinstance(m, torch.nn.Module):
            m.double()
    for p32, p64 in zip(g32.parameters(), g64.parameters()):
        assert p32.shape == p64.shape
        if not torch.equal(p32.double(), p64):
            raise SystemExit("fp64 twin construction diverged from fp32 stack")

    lr = cfg.train.lr

    def opts(g_full):
        g_models = {"efe": g_full.efe, "afe": g_full.afe, "ckd": g_full.ckd,
                    "hpe_ede": g_full.hpe_ede, "mfe": g_full.mfe,
                    "generator": g_full.generator}
        g_opts = {k: torch.optim.Adam(m.parameters(), lr=lr, betas=(0.5, 0.999))
                  for k, m in g_models.items()}
        d_opt = torch.optim.Adam(g_full.discriminator.parameters(), lr=lr,
                                 betas=(0.5, 0.999))
        return g_opts, d_opt

    g_opts32, d_opt32 = opts(g32)
    g_opts64, d_opt64 = opts(g64)

    models, teachers, parts = port_reference_objective(ref, cfg, g32)
    g_tx, d_tx = make_optimizers(cfg)
    state = TrainState(
        g_params=parts.g_params, d_params=parts.d_params, c_params=parts.c_params,
        teachers=teachers, batch_stats=parts.stats, spectral=parts.spectral,
        g_opt=g_tx.init(parts.g_params), d_opt=d_tx.init(parts.d_params),
        epoch=jnp.zeros((), jnp.int32), step=jnp.zeros((), jnp.int32))
    _, step_fn = make_train_step(cfg, models=models, train_vae=False,
                                 donate=False)

    rows = []
    for i in range(steps):
        batch32 = [torch.rand(N, 3, 256, 256,
                              generator=torch.Generator().manual_seed(1000 + i * 4 + j))
                   for j in range(4)]
        batch64 = [t.double() for t in batch32]
        batch_j = tuple(jnp.asarray(np.transpose(t.numpy(), (0, 2, 3, 1)))
                        for t in batch32)

        torch.manual_seed(2000 + i)      # same Transform draw as parity_train
        tr32 = ref.trainer.Transform(N)
        tr64 = copy.copy(tr32)
        tr64.theta = tr32.theta.double()
        tr64.control_points = tr32.control_points.double()
        tr64.control_params = tr32.control_params.double()
        tp = make_transform_params(tr32)

        lg64, ld64 = torch_step(ref, g64, d64, g_opts64, d_opt64, batch64,
                                tr64, torch.float64)
        lg32, ld32 = torch_step(ref, g32, d32, g_opts32, d_opt32, batch32,
                                tr32, torch.float32)
        state, metrics = step_fn(state, batch_j, jax.random.PRNGKey(i),
                                 transform_params=tp)

        row = {"step": i}
        for k in KEYS_G:
            row[k] = (float(lg64[k]), float(lg32[k]),
                      float(metrics["losses_g"][k]))
        for k in KEYS_D:
            row[k] = (float(ld64[k]), float(ld32[k]),
                      float(metrics["losses_d"][k]))
        rows.append(row)
        print(f"step {i}: " + "  ".join(
            f"{k} {v[0]:.4f}/{v[1]:.4f}/{v[2]:.4f}" for k, v in row.items()
            if k != "step"), flush=True)

    write_report(rows, steps)


def rel(a, b):
    return abs(a - b) / max(abs(b), 1e-9)


def write_report(rows, steps):
    lines = [
        "",
        "## fp64 ground-truth probe (tools/parity_fp64_probe.py)",
        "",
        "Three stacks, identical ported weights/data/Transform noise, real",
        "Adam steps: the reference in FLOAT64 (ground truth), the reference",
        "in float32, and ours (fp32).  t32's drift from t64 is pure fp32",
        "rounding chaos with zero implementation ambiguity; ours-vs-t64 of",
        "the same order proves the post-step drift above is intrinsic",
        "conditioning, not a backward bug.",
        "",
        "| step | loss | t64 | t32 | ours | t32 vs t64 | ours vs t64 |",
        "|---|---|---|---|---|---|---|",
    ]
    worst32 = worst_ours = 0.0
    active = [k for k in KEYS_G + KEYS_D if k not in ("K", "R")]
    for row in rows:
        for k in active:
            t64, t32, ours = row[k]
            r32, rours = rel(t32, t64), rel(ours, t64)
            worst32, worst_ours = max(worst32, r32), max(worst_ours, rours)
            lines.append(f"| {row['step']} | {k} | {t64:.5f} | {t32:.5f} | "
                         f"{ours:.5f} | {r32:.2%} | {rours:.2%} |")
    lines += [
        "",
        f"Worst-case over {steps} steps: t32-vs-t64 {worst32:.1%}, "
        f"ours-vs-t64 {worst_ours:.1%}.",
        "",
    ]
    with open(os.path.join(REPO, "PARITY.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended fp64 probe table to PARITY.md "
          f"(worst t32 {worst32:.1%}, worst ours {worst_ours:.1%})")


if __name__ == "__main__":
    main()
