"""Epoch training loop (replaces reference Logger.step, logger.py:135-184).

Per iteration: one jitted train_step (G then D phases, both Adam updates and
all BN/spectral state transitions inside a single XLA program).  The loop
only moves numpy batches to device and collects scalar metrics — there is no
per-iteration host sync of model state (the reference round-trips every loss
tensor to CPU each step, logger.py:173).

On-device augmentation: when DataConfig.on_device_aug, the CPU loader ships
only decoded frames and the augmented views are computed by a jitted
augment_batch on the accelerator before the step.
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from facevae_tpu.config import Config
from facevae_tpu.data.device_aug import augment_batch
from facevae_tpu.parallel import DATA_AXIS, is_master, master_only_print
from facevae_tpu.train.checkpoint import save_checkpoint
from facevae_tpu.train.logger import ScalarLog, Visualizer, save_visualization
from facevae_tpu.train.state import TrainState
from facevae_tpu.train.step import make_train_step


_PROFILE_START = 10


def train_loop(cfg: Config, state: TrainState, loader, mesh=None,
               start_epoch: int = 0, writer=None) -> TrainState:
    if cfg.train.debug_nans:
        # reference parity: torch.autograd.set_detect_anomaly(True)
        # (distributed.py:26) — trap the first non-finite value at its op
        jax.config.update("jax_debug_nans", True)
    if cfg.train.tensorboard and writer is None and is_master():
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(comment="facevae_tpu")

    models, step = make_train_step(cfg, mesh=mesh)
    key = jax.random.PRNGKey(cfg.train.seed)

    aug = None
    if cfg.data.on_device_aug:
        aug = jax.jit(functools.partial(augment_batch, cfg=cfg.data))

    scalar_log = ScalarLog(cfg.train.log_file)
    visualizer = Visualizer()

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P(DATA_AXIS))

    global_step = int(state.step)
    last_batch = last_metrics = None
    profiling = False
    interrupted = False
    for epoch in range(start_epoch, cfg.train.num_epochs):
        if interrupted:
            break
        master_only_print("Epoch", epoch)
        loader.set_epoch(epoch)
        t_epoch = time.time()
        n_frames = 0
        for idx, batch in enumerate(loader):
            arrays = [jnp.asarray(b) for b in batch[:2]]
            if sharding is not None:
                arrays = [jax.device_put(a, sharding) for a in arrays]
            s, d = arrays
            if aug is not None:
                k_aug = jax.random.fold_in(key, 2 * global_step + 1)
                s_a = aug(jax.random.fold_in(k_aug, 0), s)
                d_a = aug(jax.random.fold_in(k_aug, 1), d)
            else:
                s_a, d_a = (jnp.asarray(b) for b in batch[2:])
                if sharding is not None:
                    s_a = jax.device_put(s_a, sharding)
                    d_a = jax.device_put(d_a, sharding)

            if cfg.train.profile_dir and global_step == _PROFILE_START:
                jax.profiler.start_trace(cfg.train.profile_dir)
                profiling = True
            try:
                state, metrics = step(state, (s, d, s_a, d_a),
                                      jax.random.fold_in(key, global_step))
            except KeyboardInterrupt:
                # reference parity (quirk q5, logger.py:67-68): a checkpoint
                # is also written when training is interrupted
                save_checkpoint(cfg.train.ckp_dir, state, int(state.epoch))
                interrupted = True
                break
            if profiling and global_step >= _PROFILE_START + 4:
                jax.block_until_ready(metrics["losses_g"])
                jax.profiler.stop_trace()
                profiling = False
                master_only_print(f"profiler trace written to {cfg.train.profile_dir}")
            global_step += 1
            n_frames += s.shape[0]

            losses_g = {k: float(v) for k, v in metrics["losses_g"].items()}
            losses_d = {k: float(v) for k, v in metrics["losses_d"].items()}
            scalar_log.log_iter(losses_g, losses_d)
            last_batch, last_metrics = (s, d), metrics

            if writer is not None and idx % cfg.train.vis_every == 0 and is_master():
                # reference logger.py:286-299: scalars + image grid + text line
                index = epoch * len(loader) + idx
                all_losses = {**losses_g, **losses_d}
                writer.add_scalars("loss_all", all_losses, index)
                aux = jax.device_get(metrics["aux"])
                image = visualizer.visualize(
                    np.asarray(s), np.asarray(d), aux["generated_d"],
                    aux["transformed_d"], aux["kp_s"], aux["kp_d"],
                    aux["transformed_kp"], aux["occlusion"], aux["mask"])
                writer.add_image(f"image_show_{epoch}", image, index,
                                 dataformats="HWC")
                line = "; ".join(f"{k} - {v:.5f}" for k, v in all_losses.items())
                writer.add_text("log", f"{str(epoch).zfill(8)}) {line}", index)

        if profiling:      # epoch shorter than the trace window
            jax.profiler.stop_trace()
            profiling = False
            master_only_print(f"profiler trace written to {cfg.train.profile_dir}")
        dt = time.time() - t_epoch
        master_only_print(f"epoch {epoch}: {n_frames / max(dt, 1e-9):.2f} frames/s")

        state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
        if (epoch + 1) % cfg.train.checkpoint_freq == 0:
            save_checkpoint(cfg.train.ckp_dir, state, epoch)
        scalar_log.log_epoch(epoch)
        if last_metrics is not None and is_master():
            aux = jax.device_get(last_metrics["aux"])
            s_np, d_np = (np.asarray(a) for a in last_batch)
            image = visualizer.visualize(
                s_np, d_np, aux["generated_d"], aux["transformed_d"],
                aux["kp_s"], aux["kp_d"], aux["transformed_kp"],
                aux["occlusion"], aux["mask"])
            save_visualization(cfg.train.vis_dir, epoch, image)
    scalar_log.close()
    return state
