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

Enable with `train.py --device_cache true`; falls back with a clear error if
the dataset exceeds the byte budget.
"""
from __future__ import annotations

import concurrent.futures as cf
import os
from typing import List, Tuple

import numpy as np

from facevae_tpu.data.dataset import FramesDataset, _imread_raw


class DeviceFrameCache:
    """Decode a FramesDataset's train split into one device-resident uint8
    array; sample (s, d) batches by device-side gather."""

    def __init__(self, root_dir: str, frame_shape=(256, 256, 3),
                 id_sampling: bool = True, num_workers: int = 8,
                 max_bytes: int = 4 << 30):
        ds = FramesDataset(root_dir, frame_shape=frame_shape,
                           id_sampling=id_sampling, is_train=True,
                           on_device_aug=True)
        self.num_identities = len(ds)

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
        total = sum(counts)
        H, W, C = frame_shape
        nbytes = total * H * W * C
        if nbytes > max_bytes:
            raise ValueError(
                f"dataset is {nbytes/2**30:.2f} GiB decoded "
                f"({total} frames at {H}x{W}); device cache budget is "
                f"{max_bytes/2**30:.2f} GiB — use the streaming loader")

        # frame table: clip -> [start, count) into the flat frame array
        self.clip_start = np.zeros(len(clip_frames), np.int64)
        self.clip_count = np.asarray(counts, np.int64)
        np.cumsum(counts[:-1], out=self.clip_start[1:])

        flat = np.empty((total, H, W, C), np.uint8)
        paths = [p for frames in clip_frames for p in frames]

        def decode(i):
            img = _imread_raw(paths[i])
            if img.shape != (H, W, C):
                raise ValueError(f"{paths[i]}: {img.shape} != {frame_shape}")
            flat[i] = img

        with cf.ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
            list(pool.map(decode, range(total)))

        import jax
        import jax.numpy as jnp
        self.frames = jax.device_put(flat)             # ONE transfer
        del flat
        self._gather = jax.jit(lambda arr, idx: jnp.take(arr, idx, axis=0))

    def sample_indices(self, rng: np.random.RandomState, batch_size: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """FramesDataset semantics: per item pick an identity (uniform over
        the permuted epoch order handled by the caller), then a random clip
        of it, then 2 random frames with replacement, sorted (source =
        earlier frame, dataset.py:107)."""
        ids = rng.randint(0, self.num_identities, size=batch_size)
        s_idx = np.empty(batch_size, np.int32)
        d_idx = np.empty(batch_size, np.int32)
        for i, ident in enumerate(ids):
            clips = self.clips_per_id[ident]
            clip = clips[rng.randint(len(clips))]
            a, b = np.sort(rng.randint(0, self.clip_count[clip], size=2))
            s_idx[i] = self.clip_start[clip] + a
            d_idx[i] = self.clip_start[clip] + b
        return s_idx, d_idx

    def gather(self, idx: np.ndarray):
        return self._gather(self.frames, idx)


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
        (train/scan.py).  The epoch truncates to a multiple of K steps."""
        rng = np.random.RandomState(self.seed + self.epoch)
        for _ in range(len(self) // steps_per_chunk):
            s_rows, d_rows = [], []
            for _ in range(steps_per_chunk):
                s_idx, d_idx = self.cache.sample_indices(rng, self.batch_size)
                s_rows.append(s_idx)
                d_rows.append(d_idx)
            yield np.stack(s_rows), np.stack(d_rows)
