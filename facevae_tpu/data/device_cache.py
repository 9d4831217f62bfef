"""HBM-resident dataset cache: decode once, gather per step on device.

For datasets that fit device memory (VoxCeleb-crop at 256² uint8 is ~196 KB/
frame — a 5k-frame subset is ~1 GB), ALL frames are decoded once into a
single [total, H, W, 3] uint8 device array.  Each training step then draws
its (source, driving) pair by DEVICE-SIDE gather from host-chosen int32
indices: the per-step host->device traffic drops from megabytes of pixels to
64 bytes of indices.

This is the TPU-native answer to the reference's per-step CPU DataLoader
(train.py:16): the accelerator's HBM is the dataset buffer and the fused
on-device augmentation (data/device_aug.py) provides the randomness the CPU
workers provided.  Sampling semantics match FramesDataset (dataset.py
§identity sampling): identity -> random clip of that identity -> 2 random
frames with replacement.

Data-parallel meshes: pass `mesh` and the cache SHARDS over the devices —
identities are assigned round-robin to shards (the reference's
DistributedSampler stride semantics, train.py:15-16), each shard's frames
live in that device's HBM slice of one [n_shards * S, H, W, 3] array
(NamedSharding over DATA_AXIS), and `sample_indices` draws each device's
sub-batch from ITS OWN identities, returning shard-LOCAL indices laid out
shard-major.  Inside the shard_map'd scan program every device gathers from
its local block only — no cross-device traffic for data.

Enable with `train.py --device_cache true`; falls back with a clear error if
the dataset exceeds the byte budget.
"""
from __future__ import annotations

import concurrent.futures as cf
import os
from typing import List, Optional, Tuple

import numpy as np

from facevae_tpu.data.dataset import FramesDataset, _imread_raw


class DeviceFrameCache:
    """Decode a FramesDataset's train split into one device-resident uint8
    array (optionally sharded over a data-parallel mesh); sample (s, d)
    batches by device-side gather."""

    def __init__(self, root_dir: str, frame_shape=(256, 256, 3),
                 id_sampling: bool = True, num_workers: int = 8,
                 max_bytes: int = 4 << 30, mesh=None):
        ds = FramesDataset(root_dir, frame_shape=frame_shape,
                           id_sampling=id_sampling, is_train=True,
                           on_device_aug=True)
        self.num_identities = len(ds)
        self.mesh = mesh
        if mesh is not None:
            from facevae_tpu.parallel import DATA_AXIS
            self.n_shards = int(mesh.shape[DATA_AXIS])
        else:
            self.n_shards = 1
        n_shards = self.n_shards
        if n_shards > self.num_identities:
            raise ValueError(
                f"{n_shards} shards > {self.num_identities} identities — "
                "every device needs at least one identity to sample")

        # enumerate every (identity, clip) PNG-dir and its frame files
        clip_frames: List[List[str]] = []
        self.clips_per_id: List[List[int]] = []       # identity -> clip ids
        for vid_idx in range(len(ds)):
            name = ds.videos[vid_idx]
            if ds.id_sampling:
                import glob as _glob
                paths = sorted(_glob.glob(os.path.join(ds.root_dir, name + "*")))
            else:
                paths = [os.path.join(ds.root_dir, name)]
            ids = []
            for p in paths:
                if not os.path.isdir(p):
                    raise ValueError(
                        f"device cache supports PNG-frame dirs only; got {p}")
                ids.append(len(clip_frames))
                clip_frames.append(
                    [os.path.join(p, f) for f in sorted(os.listdir(p))])
            self.clips_per_id.append(ids)

        counts = [len(f) for f in clip_frames]
        H, W, C = frame_shape

        # identity -> shard (round-robin, DistributedSampler stride parity)
        self.shard_identities: List[List[int]] = [
            list(range(d, self.num_identities, n_shards)) for d in range(n_shards)]
        # lay frames out shard-major: within a shard, clips concatenate in
        # identity order; clip_start holds shard-LOCAL offsets
        self.clip_start = np.zeros(len(clip_frames), np.int64)
        self.clip_count = np.asarray(counts, np.int64)
        shard_totals = np.zeros(n_shards, np.int64)
        clip_shard = np.zeros(len(clip_frames), np.int32)
        for d in range(n_shards):
            off = 0
            for ident in self.shard_identities[d]:
                for clip in self.clips_per_id[ident]:
                    self.clip_start[clip] = off
                    clip_shard[clip] = d
                    off += counts[clip]
            shard_totals[d] = off
        self.shard_size = int(shard_totals.max())     # S (pad to equal shards)

        total_padded = self.shard_size * n_shards
        nbytes = total_padded * H * W * C
        if nbytes > max_bytes:
            raise ValueError(
                f"dataset is {nbytes/2**30:.2f} GiB decoded "
                f"({total_padded} frames incl. shard padding at {H}x{W}); "
                f"device cache budget is {max_bytes/2**30:.2f} GiB — use the "
                "streaming loader")

        flat = np.zeros((total_padded, H, W, C), np.uint8)
        jobs = []                                     # (flat index, path)
        for clip, frames in enumerate(clip_frames):
            base = clip_shard[clip] * self.shard_size + self.clip_start[clip]
            jobs.extend((base + j, p) for j, p in enumerate(frames))

        def decode(job):
            i, path = job
            img = _imread_raw(path)
            if img.shape != (H, W, C):
                raise ValueError(f"{path}: {img.shape} != {frame_shape}")
            flat[i] = img

        with cf.ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
            list(pool.map(decode, jobs))

        import jax
        import jax.numpy as jnp
        if mesh is None:
            self.frames = jax.device_put(flat)        # ONE transfer
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from facevae_tpu.parallel import DATA_AXIS
            self.frames = jax.device_put(
                flat, NamedSharding(mesh, P(DATA_AXIS)))
        del flat
        self._gather = jax.jit(lambda arr, idx: jnp.take(arr, idx, axis=0))

    def sample_indices(self, rng: np.random.RandomState, batch_size: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """FramesDataset semantics: per item pick an identity (uniform over
        the permuted epoch order handled by the caller), then a random clip
        of it, then 2 random frames with replacement, sorted (source =
        earlier frame, dataset.py:107).

        With a sharded cache the batch is laid out shard-major — item i
        belongs to shard i // (batch_size / n_shards), draws from that
        shard's identities, and the returned indices are shard-LOCAL."""
        if batch_size % self.n_shards:
            raise ValueError(f"batch {batch_size} not divisible by "
                             f"{self.n_shards} shards")
        per_shard = batch_size // self.n_shards
        s_idx = np.empty(batch_size, np.int32)
        d_idx = np.empty(batch_size, np.int32)
        for i in range(batch_size):
            shard = i // per_shard
            idents = self.shard_identities[shard]
            ident = idents[rng.randint(len(idents))]
            clips = self.clips_per_id[ident]
            clip = clips[rng.randint(len(clips))]
            a, b = np.sort(rng.randint(0, self.clip_count[clip], size=2))
            s_idx[i] = self.clip_start[clip] + a
            d_idx[i] = self.clip_start[clip] + b
        return s_idx, d_idx

    def to_flat(self, idx: np.ndarray) -> np.ndarray:
        """Map a shard-major batch of shard-LOCAL indices to flat positions
        in `frames` (host-side; for the epoch visualizer's gather)."""
        idx = np.asarray(idx)
        if self.n_shards == 1:
            return idx
        per_shard = idx.shape[-1] // self.n_shards
        shard = np.arange(idx.shape[-1]) // per_shard
        return idx + (shard * self.shard_size).astype(idx.dtype)

    def gather(self, idx: np.ndarray):
        return self._gather(self.frames, self.to_flat(idx))


class CachedLoader:
    """PrefetchLoader-compatible iterator over a DeviceFrameCache: yields
    (s, d) batches that ALREADY live on device (uint8)."""

    def __init__(self, cache: DeviceFrameCache, batch_size: int,
                 num_items: int, seed: int = 0):
        self.cache = cache
        self.batch_size = batch_size
        self.num_items = num_items
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.num_items // self.batch_size

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self.epoch)
        for _ in range(len(self)):
            s_idx, d_idx = self.cache.sample_indices(rng, self.batch_size)
            yield self.cache.gather(s_idx), self.cache.gather(d_idx)

    def iter_index_chunks(self, steps_per_chunk: int):
        """Yield ([K, B], [K, B]) int32 index tables for the scan dispatcher
        (train/scan.py).  The epoch's `len(self) % K` remainder steps come
        through as ONE final smaller chunk (same K_rem every epoch, so it
        costs a single extra scan compile over the whole run) — no steps are
        dropped."""
        rng = np.random.RandomState(self.seed + self.epoch)
        remaining = len(self)
        while remaining > 0:
            k = min(steps_per_chunk, remaining)
            remaining -= k
            s_rows, d_rows = [], []
            for _ in range(k):
                s_idx, d_idx = self.cache.sample_indices(rng, self.batch_size)
                s_rows.append(s_idx)
                d_rows.append(d_idx)
            yield np.stack(s_rows), np.stack(d_rows)
