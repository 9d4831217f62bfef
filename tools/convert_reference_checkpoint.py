#!/usr/bin/env python
"""Convert a reference torch checkpoint (%08d-checkpoint.pth.tar, written by
the reference Logger.save_cpk — logger.py:93-102) into a facevae_tpu
checkpoint so trained reference weights run through evaluate.py here.

  python tools/convert_reference_checkpoint.py --torch_ckp 00000044-checkpoint.pth.tar \
      --out_dir ckp --epoch 44 [--image_size 256]

Per-model state dicts are ported by structural order-zip
(facevae_tpu.utils_port): conv OIHW->HWIO, linear transpose, BN buffers into
batch_stats, spectral weight_orig into kernels.  Optimizer state is NOT
converted (torch Adam moments live in a different param basis); resuming
training from a converted checkpoint restarts optimizer moments.

Caveat: flax init must produce variable dicts in creation order (true for
flax's plain-dict variables); the converter cross-checks by shape at every
leaf and aborts on any mismatch.
"""
import argparse

import numpy as np


# torch module definition order == call order for all these (verified against
# reference models.py); Hopenet-style vestigial heads don't appear here.
MODELS = ("efe", "afe", "ckd", "hpe_ede", "mfe", "generator", "discriminator")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckp", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--epoch", type=int, required=True)
    p.add_argument("--image_size", type=int, default=256)
    args = p.parse_args()

    import torch
    import jax
    from facevae_tpu.config import Config, ModelConfig
    from facevae_tpu.train import create_train_state, save_checkpoint
    from facevae_tpu.train.state import build_all_modules, init_all_variables
    from facevae_tpu.utils_port import port_torch_to_flax

    ckp = torch.load(args.torch_ckp, map_location="cpu")
    cfg = Config(model=ModelConfig(image_size=args.image_size))
    state = create_train_state(cfg, seed=0)
    # The order-zip port needs creation-ordered variable dicts; the train
    # state's jit'd init re-sorts dict keys, so re-init EAGERLY for porting
    # (offline tool: eager per-op dispatch cost is acceptable).
    variables = init_all_variables(build_all_modules(cfg), cfg, seed=0)

    g_params = dict(state.g_params)
    d_params = dict(state.d_params)
    stats = dict(state.batch_stats)
    spectral = jax.tree.map(np.asarray, dict(state.spectral))
    for name in MODELS:
        sd = {k: v.numpy() for k, v in ckp[name].items()}
        tgt = g_params if name in g_params else d_params
        sp = spectral.get(name)
        new_p, new_s = port_torch_to_flax(
            sd, variables[name]["params"], variables[name].get("batch_stats"),
            spectral=sp)
        tgt[name] = new_p
        if new_s is not None:
            stats[name] = new_s
        if sp is not None:
            spectral[name] = sp
        print(f"ported {name}: {len(sd)} torch arrays")

    state = state.replace(g_params=g_params, d_params=d_params,
                          batch_stats=stats, spectral=spectral,
                          epoch=np.asarray(args.epoch, np.int32))
    path = save_checkpoint(args.out_dir, state, args.epoch)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
