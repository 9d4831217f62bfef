"""Multi-step dispatch: lax.scan over K train steps in ONE XLA program.

The reference's hot loop pays per-step host work by construction — a CPU
DataLoader hand-off, `.cuda()` copies, and a loss `.item()` sync every
iteration (/root/reference/logger.py:142-173, train.py:16).  The single-step
JAX loop already batches the metric syncs, but each `step()` call is still a
host->device dispatch plus an eager `fold_in` — measured at 50-130 ms/step
through a tunneled runtime (PERF.md "host pipeline").

This module removes the host from the loop entirely for the device-cache
path (data/device_cache.py): given the HBM-resident frame array and a
[K, B] table of host-sampled frame indices, ONE jitted program

    scan over k = 0..K-1:
        gather (s, d) from the cache          (device-side, uint8)
        fused augmentation + G step + D step  (train/step.py body)

and returns the carried state, the K stacked per-step loss scalars (one
device_get per call instead of per step), and the LAST step's aux pytree
(for the epoch visualizer — stacking K image-sized auxes would waste HBM).

Per-step RNG folds the base key with `state.step` INSIDE the program, so
the stream is identical regardless of K and resumes correctly from a
checkpoint (the single-step loop folds with the same global step counter).

Data-parallel meshes: pass `mesh` and the whole scan program runs under
shard_map — the frame cache is sharded over DATA_AXIS (device_cache.py
shard-major layout), index columns shard with it (each device's [K, B/n]
block holds shard-LOCAL indices into its own HBM frame block), and the step
body's pmean'd gradients / SyncBN statistics keep the replicated state in
sync exactly as in the per-step mesh loop (reference analog: DDP +
DistributedSampler, train.py:15-16, logger.py:55-58).  Multi-chip training
thus gets the same host-free K-steps-per-dispatch loop as single-chip —
the per-dispatch host cost is one [K, B] int32 transfer.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from facevae_tpu.config import Config
from facevae_tpu.train.state import TrainState
from facevae_tpu.train.step import make_train_step, _AUX_TEMPLATE


def make_scan_train_step(cfg: Config, models: Optional[Dict[str, Any]] = None,
                         donate: bool = True, mesh=None):
    """Returns (models, scan_fn) with

        scan_fn(state, frames, s_idx, d_idx, rng) -> (state, metrics)

    frames: [T, H, W, 3] uint8 device array (the whole train split; with a
    mesh, T = n_shards * S sharded over DATA_AXIS);
    s_idx/d_idx: [K, B] int32 frame indices (host-sampled, FramesDataset
    semantics — see DeviceFrameCache.sample_indices; with a mesh the B
    columns are shard-major shard-LOCAL indices); rng: base PRNG key.
    metrics: {"losses_g": {name: [K]}, "losses_d": {...}, "aux": last-step
    aux}.  K is static per compilation (one program per distinct K).
    """
    models, step_body = make_train_step(cfg, models=models, mesh=mesh,
                                        fused_aug=True, raw=True)

    def scan_fn(state: TrainState, frames, s_idx, d_idx, rng
                ) -> Tuple[TrainState, Dict[str, Any]]:
        def one(st, si, di):
            s = jnp.take(frames, si, axis=0)
            d = jnp.take(frames, di, axis=0)
            k = jax.random.fold_in(rng, st.step)
            return step_body(st, (s, d), k)

        # aux template (zeros) so the carry has a fixed pytree from step 0
        aux_shapes = jax.eval_shape(
            lambda st, si, di: one(st, si, di)[1]["aux"],
            state, s_idx[0], d_idx[0])
        aux0 = jax.tree.map(lambda t: jnp.zeros(t.shape, t.dtype), aux_shapes)

        def body(carry, xs):
            st, _ = carry
            si, di = xs
            new_st, metrics = one(st, si, di)
            return (new_st, metrics["aux"]), (metrics["losses_g"],
                                              metrics["losses_d"])

        (state, aux), (losses_g, losses_d) = jax.lax.scan(
            body, (state, aux0), (s_idx, d_idx))
        return state, {"losses_g": losses_g, "losses_d": losses_d, "aux": aux}

    donate_kw = dict(donate_argnums=(0,) if donate else ())
    if mesh is None:
        return models, jax.jit(scan_fn, **donate_kw)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from facevae_tpu.parallel import DATA_AXIS

    idx_spec = P(None, DATA_AXIS)           # [K, B]: shard the batch columns
    out_metric_spec = {
        "losses_g": P(), "losses_d": P(),   # pmean'd inside -> replicated [K]
        "aux": jax.tree.map(lambda _: P(DATA_AXIS), _AUX_TEMPLATE)}
    sharded = jax.jit(shard_map(
        scan_fn, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), idx_spec, idx_spec, P()),
        out_specs=(P(), out_metric_spec),
        check_vma=False,
    ), **donate_kw)
    return models, sharded
