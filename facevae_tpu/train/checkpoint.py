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
import re
from typing import List, Optional, Tuple

import jax
from flax import serialization

from facevae_tpu.parallel import is_master
from facevae_tpu.train.state import TrainState
from facevae_tpu.utils import locked_device_get

_CKPT_RE = re.compile(r"^(\d{8})-checkpoint\.msgpack$")


def checkpoint_path(ckp_dir: str, epoch: int, zfill_num: int = 8) -> str:
    return os.path.join(ckp_dir, f"{str(epoch).zfill(zfill_num)}-checkpoint.msgpack")


def list_checkpoints(ckp_dir: str) -> List[Tuple[int, str]]:
    """Epoch-sorted [(epoch, path)] of complete checkpoints in ckp_dir."""
    if not os.path.isdir(ckp_dir):
        return []
    out = []
    for name in os.listdir(ckp_dir):
        m = _CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(ckp_dir, name)))
    return sorted(out)


def latest_checkpoint_epoch(ckp_dir: str) -> Optional[int]:
    ckpts = list_checkpoints(ckp_dir)
    return ckpts[-1][0] if ckpts else None


def prune_checkpoints(ckp_dir: str, keep: int) -> List[str]:
    """Delete all but the `keep` newest epoch checkpoints (keep <= 0: keep
    all).  The reference writes one ~GB .pth.tar per epoch forever
    (logger.py:93-102 + checkpoint_freq 1): a 150-epoch run is ~240 GB of
    checkpoints.  Retention is the TPU-first fix the reference lacks; resume
    always targets one of the retained (newest) epochs."""
    removed = []
    if keep <= 0:
        return removed
    ckpts = list_checkpoints(ckp_dir)
    for _, path in ckpts[:-keep] if len(ckpts) > keep else []:
        try:
            os.remove(path)
            removed.append(path)
        except OSError:
            pass                      # a racing reader holds it; retry next save
    return removed


def save_checkpoint(ckp_dir: str, state: TrainState, epoch: int,
                    keep: int = 0) -> Optional[str]:
    if not is_master():
        return None
    os.makedirs(ckp_dir, exist_ok=True)
    path = checkpoint_path(ckp_dir, epoch)
    # chunked + lock-per-leaf: this runs on the AsyncCheckpointer thread
    # while training dispatches; see utils.TRANSFER_LOCK for why the pull
    # must not issue concurrently with other threads' transfers
    state = locked_device_get(state)
    blob = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    prune_checkpoints(ckp_dir, keep)
    return path


class AsyncCheckpointer:
    """Checkpoint saves off the training path.

    The flagship state is ~1.6 GB (6 sub-model params + both Adam moments);
    a synchronous device_get + msgpack + write at every epoch boundary stalls
    training for seconds (worse through a tunneled runtime).  Here `save`
    takes a cheap ON-DEVICE snapshot (fresh buffers, so the training step may
    donate the live state immediately) and a background thread does the
    device->host pull and the file write while the next epoch trains.

    One save in flight at a time (a second `save` joins the first); `wait`
    flushes — call it before process exit and before crash-saves so no epoch
    file is lost.
    """

    def __init__(self):
        import threading
        self._threading = threading
        self._thread: Optional[object] = None
        self._snapshot = None            # jitted identity-copy, compiled once

    def _snap(self, state: TrainState) -> TrainState:
        import jax.numpy as jnp
        if self._snapshot is None:
            self._snapshot = jax.jit(
                lambda s: jax.tree.map(jnp.copy, s))
        return self._snapshot(state)

    def save(self, ckp_dir: str, state: TrainState, epoch: int,
             keep: int = 0) -> None:
        if not is_master():
            return
        self.wait()
        snap = self._snap(state)         # distinct buffers; donation-safe

        def write():
            save_checkpoint(ckp_dir, snap, epoch, keep=keep)

        self._thread = self._threading.Thread(target=write, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def load_checkpoint(ckp_dir: str, epoch: int, template: TrainState) -> TrainState:
    """Restore into a freshly-initialized template state (shape-checked)."""
    path = checkpoint_path(ckp_dir, epoch)
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(template, blob)
