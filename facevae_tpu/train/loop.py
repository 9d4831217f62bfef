"""Epoch training loop (replaces reference Logger.step, logger.py:135-184).

Per iteration: one jitted train_step (G then D phases, both Adam updates, the
on-device augmentation, and all BN/spectral state transitions inside a single
XLA program).  The host never blocks on the device inside the hot loop:

  - batches are decoded by the loader's thread pool and moved to device by a
    background prefetch thread (double-buffering host->device transfers
    against device compute; the reference's analog is pin_memory +
    .cuda(non_blocking), logger.py:142-148);
  - loss scalars stay ON DEVICE and are fetched by a background drain
    thread in batches (the reference round-trips every loss tensor to CPU
    each step, logger.py:173) — the drain queue is BOUNDED, which doubles
    as the dispatch-depth bound so the host can't run unboundedly ahead;
  - checkpoint/visualization writes happen at epoch boundaries only.
"""
from __future__ import annotations

import functools
import queue
import threading
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from facevae_tpu.config import Config
from facevae_tpu.data.device_aug import augment_batch
from facevae_tpu.parallel import DATA_AXIS, is_master, master_only_print
from facevae_tpu.train.checkpoint import AsyncCheckpointer, save_checkpoint
from facevae_tpu.train.logger import ScalarLog, Visualizer, save_visualization
from facevae_tpu.train.state import TrainState
from facevae_tpu.train.step import make_train_step
from facevae_tpu.utils import TRANSFER_LOCK


_PROFILE_START = 10
_SYNC_EVERY = 8          # steps between batched metric fetches (depth bound)


@jax.jit
def _vis_cast(aux):
    """Cast the vis aux tree to fp16 in ONE compiled program.  Eager per-leaf
    astype through the axon tunnel pays a remote dispatch (and on first use a
    remote compile) per leaf — measured minutes of epoch-boundary 'vis' time;
    a single jit makes it one dispatch."""
    return jax.tree.map(
        lambda a: a.astype(jnp.float16)
        if a.dtype in (jnp.float32, jnp.bfloat16) else a, aux)


def _device_prefetch(loader, sharding, depth: int = 2):
    """Yield loader batches as device arrays, transferred by a background
    thread so the host->device copy of batch n+1 overlaps step n."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    err = []
    _SENTINEL = object()

    def worker():
        try:
            for batch in loader:
                with TRANSFER_LOCK:      # see utils.TRANSFER_LOCK
                    arrays = tuple(
                        jax.device_put(b, sharding) if sharding is not None
                        else jnp.asarray(b) for b in batch)
                while not stop.is_set():
                    try:
                        q.put(arrays, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:          # surfaced on the consumer side
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.5)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


class _MetricBuffer:
    """Holds per-step device loss dicts; fetches them host-side in batches.

    The fetch (`jax.device_get`) is a HARD sync: it waits for the producing
    dispatch to finish and then pays a device->host round trip — done on the
    hot loop's thread it stalls dispatch for >1 s per drain (measured: the
    scan CLI ran at 11.8 f/s vs 15.9 f/s for the identical step stream
    without the per-dispatch drain).  So the fetch runs on a worker thread:
    `flush` hands device arrays over a BOUNDED queue (the queue depth is the
    host-run-ahead bound the synchronous drain used to provide), the worker
    fetches + writes the add.txt lines, and `drain()` blocks until
    everything handed over so far is logged (epoch boundaries, vis, final
    flush)."""

    _DEPTH = 4                     # max un-fetched dispatch groups in flight

    def __init__(self, scalar_log: ScalarLog):
        self.scalar_log = scalar_log
        self.pending = []
        self.last = None                     # last fetched (g, d) host dicts
        self._q: queue.Queue = queue.Queue(maxsize=self._DEPTH)
        self._err = []
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def push(self, losses_g, losses_d):
        self.pending.append((losses_g, losses_d))

    def flush(self):
        """Hand the pending device metrics to the fetch worker (non-blocking
        unless the worker is _DEPTH groups behind, which doubles as the
        dispatch-depth bound)."""
        if self._err:
            raise self._err[0]
        if not self.pending:
            return
        self._q.put(self.pending)
        self.pending = []

    def drain(self):
        """Flush and wait until every handed-over group is logged."""
        self.flush()
        self._q.join()
        if self._err:
            raise self._err[0]

    def _run(self):
        while True:
            # greedy: batch every queued group into ONE device_get — each
            # fetch pays a tunnel round trip, so per-group fetches cap the
            # worker below the dispatch rate and backpressure the hot loop
            groups = [self._q.get()]
            while True:
                try:
                    groups.append(self._q.get_nowait())
                except queue.Empty:
                    break
            try:
                self._process([p for g in groups for p in g])
            except Exception as e:           # surfaced on the next flush/drain
                self._err.append(e)
            finally:
                for _ in groups:
                    self._q.task_done()

    def _process(self, group):
        with TRANSFER_LOCK:              # see utils.TRANSFER_LOCK
            host = jax.device_get(group)
        for g, d in host:
            rows = []
            probe = next(iter(g.values()))
            if np.ndim(probe) == 1:          # stacked [K] from the scan path
                for k in range(len(probe)):
                    rows.append(({n: float(v[k]) for n, v in g.items()},
                                 {n: float(v[k]) for n, v in d.items()}))
            else:
                rows.append(({n: float(v) for n, v in g.items()},
                             {n: float(v) for n, v in d.items()}))
            for g_row, d_row in rows:
                self.scalar_log.log_iter(g_row, d_row)
                self.last = (g_row, d_row)


def train_loop(cfg: Config, state: TrainState, loader, mesh=None,
               start_epoch: int = 0, writer=None) -> TrainState:
    if cfg.train.debug_nans:
        # reference parity: torch.autograd.set_detect_anomaly(True)
        # (distributed.py:26) — trap the first non-finite value at its op
        jax.config.update("jax_debug_nans", True)
    if cfg.train.tensorboard and writer is None and is_master():
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(comment="facevae_tpu")

    fused_aug = cfg.data.on_device_aug
    # scan mode: K steps per dispatch over the HBM frame cache — requires
    # the device-cache loader (index-table sampling) and fused aug; with a
    # mesh the cache/scan shard over DATA_AXIS (train/scan.py)
    scan_mode = (cfg.train.steps_per_call > 1
                 and fused_aug and hasattr(loader, "iter_index_chunks"))
    if scan_mode:
        from facevae_tpu.train.scan import make_scan_train_step
        models, step = make_scan_train_step(cfg, mesh=mesh)
    else:
        models, step = make_train_step(cfg, mesh=mesh, fused_aug=fused_aug)
    key = jax.random.PRNGKey(cfg.train.seed)

    scalar_log = ScalarLog(cfg.train.log_file)
    visualizer = Visualizer()
    metrics_buf = _MetricBuffer(scalar_log)
    checkpointer = AsyncCheckpointer()

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
        if scan_mode:
            K = cfg.train.steps_per_call
            if epoch == start_epoch and len(loader) % K:
                master_only_print(
                    f"scan mode: {len(loader)} steps/epoch = "
                    f"{len(loader) // K} chunks of {K} + one remainder chunk "
                    f"of {len(loader) % K} (one extra compile)")
            last_chunk = None
            # index chunks are host-sampled then staged to device by the
            # prefetch thread so the [K,B] transfers overlap device compute
            # (a synchronous per-dispatch transfer pays the tunnel RTT twice)
            chunk_iter = _device_prefetch(loader.iter_index_chunks(K), None)
            for cidx, (s_idx, d_idx) in enumerate(chunk_iter):
                if cfg.train.profile_dir and not profiling and cidx == 1:
                    jax.profiler.start_trace(cfg.train.profile_dir)
                    profiling = True
                try:
                    state, metrics = step(state, loader.cache.frames,
                                          jnp.asarray(s_idx), jnp.asarray(d_idx),
                                          key)
                except KeyboardInterrupt:
                    checkpointer.wait()
                    save_checkpoint(cfg.train.ckp_dir, state, int(state.epoch))
                    interrupted = True
                    break
                except BaseException:
                    checkpointer.wait()
                    save_checkpoint(cfg.train.ckp_dir, state, int(state.epoch))
                    raise
                if profiling:
                    jax.device_get(metrics["losses_g"])
                    jax.profiler.stop_trace()
                    profiling = False
                    master_only_print(
                        f"profiler trace written to {cfg.train.profile_dir}")
                global_step += int(s_idx.shape[0])   # K, or the remainder chunk
                n_frames += s_idx.size
                metrics_buf.push(metrics["losses_g"], metrics["losses_d"])
                metrics_buf.flush()          # async fetch; bounded-queue depth
                # keep whole device arrays; slicing here would be an eager
                # per-dispatch device op (tunnel round trip)
                last_chunk, last_metrics = (s_idx, d_idx), metrics
            if last_chunk is not None:
                # epoch visualizer inputs: gather the final step's (s, d)
                last_batch = (loader.cache.gather(last_chunk[0][-1]),
                              loader.cache.gather(last_chunk[1][-1]))
        step_iter = (() if scan_mode
                     else enumerate(_device_prefetch(loader, sharding)))
        for idx, batch in step_iter:
            if fused_aug:
                s, d = batch[0], batch[1]
                step_batch = (s, d)
            else:
                s, d = batch[0], batch[1]
                step_batch = batch

            if cfg.train.profile_dir and global_step == _PROFILE_START:
                jax.profiler.start_trace(cfg.train.profile_dir)
                profiling = True
            try:
                state, metrics = step(state, step_batch,
                                      jax.random.fold_in(key, global_step))
            except KeyboardInterrupt:
                # reference parity (quirk q5, logger.py:67-68): a checkpoint
                # is also written when training is interrupted
                checkpointer.wait()
                save_checkpoint(cfg.train.ckp_dir, state, int(state.epoch))
                interrupted = True
                break
            except BaseException:
                # quirk q5 covers ANY teardown (Logger.__del__ fires on GC
                # whatever killed the loop): save the last good state before
                # re-raising so an OOM/data error doesn't lose the epoch
                checkpointer.wait()
                save_checkpoint(cfg.train.ckp_dir, state, int(state.epoch))
                raise
            if profiling and global_step >= _PROFILE_START + 4:
                jax.block_until_ready(metrics["losses_g"])
                jax.profiler.stop_trace()
                profiling = False
                master_only_print(f"profiler trace written to {cfg.train.profile_dir}")
            global_step += 1
            n_frames += s.shape[0]

            metrics_buf.push(metrics["losses_g"], metrics["losses_d"])
            if len(metrics_buf.pending) >= _SYNC_EVERY:
                metrics_buf.flush()          # async fetch; bounded-queue depth
            last_batch, last_metrics = (s, d), metrics

            if writer is not None and idx % cfg.train.vis_every == 0 and is_master():
                # reference logger.py:286-299: scalars + image grid + text line
                metrics_buf.drain()
                losses_g, losses_d = metrics_buf.last
                index = epoch * len(loader) + idx
                all_losses = {**losses_g, **losses_d}
                writer.add_scalars("loss_all", all_losses, index)
                with TRANSFER_LOCK:
                    aux = jax.device_get(_vis_cast(metrics["aux"]))
                aux = jax.tree.map(lambda a: np.asarray(a, np.float32), aux)
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
        metrics_buf.drain()
        dt = time.time() - t_epoch

        state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
        scalar_log.log_epoch(epoch)
        # vis BEFORE the checkpoint snapshot: its ~80 MB aux fetch must not
        # queue behind the checkpointer's ~1.6 GB device->host pull
        t_vis = time.time()
        vis_detail = ""
        if last_metrics is not None and is_master():
            # fp16 halves the device->host pull; display precision only.
            # TRANSFER_LOCK: the previous epoch's async checkpoint pull may
            # still be in flight on its worker thread
            with TRANSFER_LOCK:
                aux = jax.device_get(_vis_cast(last_metrics["aux"]))
            aux = jax.tree.map(lambda a: np.asarray(a, np.float32), aux)
            t1 = time.time()
            with TRANSFER_LOCK:
                s_np = np.asarray(last_batch[0])
                d_np = np.asarray(last_batch[1])
            if s_np.dtype == np.uint8:
                s_np = s_np.astype(np.float32) / 255.0
                d_np = d_np.astype(np.float32) / 255.0
            t2 = time.time()
            image = visualizer.visualize(
                s_np, d_np, aux["generated_d"], aux["transformed_d"],
                aux["kp_s"], aux["kp_d"], aux["transformed_kp"],
                aux["occlusion"], aux["mask"])
            t3 = time.time()
            save_visualization(cfg.train.vis_dir, epoch, image)
            t4 = time.time()
            vis_detail = (f" [aux-get {t1 - t_vis:.1f} batch-get {t2 - t1:.1f}"
                          f" draw {t3 - t2:.1f} write {t4 - t3:.1f}]")
        t_vis = time.time() - t_vis
        t_ckpt = time.time()
        if (epoch + 1) % cfg.train.checkpoint_freq == 0:
            # async: on-device snapshot now, device->host pull + file write
            # overlap the next epoch (the flagship state is ~1.6 GB)
            checkpointer.save(cfg.train.ckp_dir, state, epoch,
                              keep=cfg.train.keep_checkpoints)
        t_ckpt = time.time() - t_ckpt
        total = dt + t_ckpt + t_vis
        master_only_print(
            f"epoch {epoch}: {n_frames / max(total, 1e-9):.2f} frames/s "
            f"(steps {dt:.1f}s, ckpt-snap {t_ckpt:.1f}s, vis {t_vis:.1f}s"
            f"{vis_detail})")
    checkpointer.wait()
    scalar_log.close()
    return state
