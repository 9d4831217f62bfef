"""Parallelism layer: device mesh, process gating, collective helpers.

Replaces the reference's NCCL stack (distributed.py: init_dist/get_rank/
master_only + DDP gradient buckets + SyncBatchNorm stat all-reduce) with a
1-axis jax.sharding.Mesh.  Gradients and BN statistics ride ICI via
lax.pmean inside shard_map; multi-host setups call jax.distributed.initialize
once per process (single-controller per host — no mp.spawn).
"""
from facevae_tpu.parallel.mesh import (
    DATA_AXIS, make_mesh, init_distributed, is_master, master_only_print, local_batch_size,
)
