"""Epoch checkpoints.

Format parity with the reference (logger.py:93-115): one file per epoch named
`%08d-checkpoint.msgpack` containing every sub-model's params, every
optimizer state, mutable collections, and the epoch index.  Saved by the
master process only; `load_checkpoint` restores everything and resumes at
epoch+1 (reference logger.py:115).

Serialization is flax msgpack (atomic via tmp+rename — the torch.save path in
the reference can leave torn files on crash).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
from flax import serialization

from facevae_tpu.parallel import is_master
from facevae_tpu.train.state import TrainState


def checkpoint_path(ckp_dir: str, epoch: int, zfill_num: int = 8) -> str:
    return os.path.join(ckp_dir, f"{str(epoch).zfill(zfill_num)}-checkpoint.msgpack")


def save_checkpoint(ckp_dir: str, state: TrainState, epoch: int) -> Optional[str]:
    if not is_master():
        return None
    os.makedirs(ckp_dir, exist_ok=True)
    path = checkpoint_path(ckp_dir, epoch)
    state = jax.device_get(state)
    blob = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(ckp_dir: str, epoch: int, template: TrainState) -> TrainState:
    """Restore into a freshly-initialized template state (shape-checked)."""
    path = checkpoint_path(ckp_dir, epoch)
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(template, blob)
