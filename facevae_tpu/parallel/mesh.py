"""Mesh construction and process utilities.

Reference parity map (SURVEY.md §2.5):
  init_dist (distributed.py:24)      -> init_distributed() / make_mesh()
  get_rank/get_world_size (:34,:43)  -> jax.process_index()/device mesh size
  master_only/is_master (:52,:66)    -> is_master()
  DDP grad all-reduce                -> lax.pmean over DATA_AXIS in the step
  SyncBatchNorm stat all-reduce      -> BatchNorm(axis_name=DATA_AXIS)
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (one controller per host).

    Single-host runs need nothing; multi-host reads standard JAX env vars or
    explicit args.  Replaces the env:// NCCL rendezvous (distributed.py:30).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-axis data-parallel mesh over all (or the first n) local+global devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def is_master() -> bool:
    return jax.process_index() == 0


def master_only_print(*args, **kwargs) -> None:
    if is_master():
        print(*args, **kwargs)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by mesh size {n}")
    return global_batch // n
