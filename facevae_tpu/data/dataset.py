"""Frame datasets (reference dataset.py).

FramesDataset semantics (dataset.py:37-135): videos are .mp4/.gif files or
PNG-frame directories; train/test split by train|test subdirs or an 80/20
random split; identity sampling picks a random clip of the identity via
`name.split('#')[0]` globbing; each item draws 2 random frames (source,
driving) plus per-frame augmented copies for the contrastive branch.

Frames here are channel-last [H,W,3] float32 (the framework convention); the
reference returns CHW.
"""
from __future__ import annotations

import glob
import os
import random
from typing import Optional, Sequence

import numpy as np
import imageio.v2 as imageio

from facevae_tpu.data.augmentation import AllAugmentationTransform


def _imread_raw(path: str) -> np.ndarray:
    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    return img


def _imread_float(path: str) -> np.ndarray:
    img = _imread_raw(path)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def read_video(name: str, frame_shape=(256, 256, 3)) -> np.ndarray:
    """Read a video: PNG-frame dir, .mp4 or .gif (reference dataset.py:13-34)."""
    if os.path.isdir(name):
        frames = sorted(os.listdir(name))
        return np.stack([_imread_float(os.path.join(name, f)) for f in frames])
    if name.lower().endswith((".gif", ".mp4")):
        video = np.asarray(imageio.mimread(name, memtest=False))
        if video.ndim == 3:
            video = np.stack([video] * 3, axis=-1)
        if video.shape[-1] == 4:
            video = video[..., :3]
        return video.astype(np.float32) / 255.0 if video.dtype == np.uint8 else video.astype(np.float32)
    raise ValueError(f"Unknown file extension: {name}")


_DEFAULT_AUG = {
    "rotation_param": {"degrees": 30},
    "perspective_param": {"pers_num": 30, "enlarge_num": 40},
    "jitter_param": {"brightness": 0.1, "contrast": 0.1, "saturation": 0.1, "hue": 0.1},
}


class FramesDataset:
    def __init__(self, root_dir: str, frame_shape=(256, 256, 3), id_sampling: bool = True,
                 is_train: bool = True, random_seed: int = 0, pairs_list=None,
                 augmentation_params: Optional[dict] = None,
                 on_device_aug: bool = False):
        # on_device_aug: items skip the CPU transform entirely and stay uint8
        # — the fused jax augmentation runs on the accelerator, and shipping
        # raw bytes quarters the host->device transfer (the reference pays
        # float32 CHW over PCIe, train.py:16 + logger.py:142-148)
        self.on_device_aug = on_device_aug
        self.root_dir = root_dir
        self.frame_shape = tuple(frame_shape)
        self.pairs_list = pairs_list
        self.id_sampling = id_sampling
        videos = sorted(os.listdir(root_dir))

        if os.path.exists(os.path.join(root_dir, "train")):
            assert os.path.exists(os.path.join(root_dir, "test")), "train/ without test/"
            if id_sampling:
                train_videos = sorted({os.path.basename(v).split("#")[0]
                                       for v in os.listdir(os.path.join(root_dir, "train"))})
            else:
                train_videos = sorted(os.listdir(os.path.join(root_dir, "train")))
            test_videos = sorted(os.listdir(os.path.join(root_dir, "test")))
            self.root_dir = os.path.join(root_dir, "train" if is_train else "test")
        else:
            rng = np.random.RandomState(random_seed)
            videos = list(videos)
            rng.shuffle(videos)
            n_test = max(1, int(0.2 * len(videos)))
            test_videos, train_videos = videos[:n_test], videos[n_test:]

        self.videos = train_videos if is_train else test_videos
        self.is_train = is_train
        if is_train:
            params = _DEFAULT_AUG if augmentation_params is None else augmentation_params
            self.transform = AllAugmentationTransform(**params)
        else:
            self.transform = None

    def __len__(self):
        return len(self.videos)

    def _resolve_path(self, idx: int) -> str:
        name = self.videos[idx]
        if self.is_train and self.id_sampling:
            candidates = (glob.glob(os.path.join(self.root_dir, name + "*.mp4"))
                          or glob.glob(os.path.join(self.root_dir, name + "*")))
            return np.random.choice(candidates)
        return os.path.join(self.root_dir, name)

    def __getitem__(self, idx: int):
        path = self._resolve_path(idx)
        if self.is_train and self.on_device_aug and os.path.isdir(path):
            # fast path: two raw uint8 frames, no CPU transform, no float cast
            frames = sorted(os.listdir(path))
            frame_idx = np.sort(np.random.choice(len(frames), replace=True, size=2))
            a = _imread_raw(os.path.join(path, frames[frame_idx[0]]))
            b = _imread_raw(os.path.join(path, frames[frame_idx[1]]))
            return np.ascontiguousarray(a), np.ascontiguousarray(b)
        if self.is_train and os.path.isdir(path):
            frames = sorted(os.listdir(path))
            frame_idx = np.sort(np.random.choice(len(frames), replace=True, size=2))
            video = [_imread_float(os.path.join(path, frames[i])) for i in frame_idx]
        else:
            video = read_video(path, self.frame_shape)
            if self.is_train:
                frame_idx = np.sort(np.random.choice(len(video), replace=True, size=2))
                video = [video[i] for i in frame_idx]

        if self.is_train:
            source = np.asarray(video[0], np.float32)
            driving = np.asarray(video[1], np.float32)
            if self.on_device_aug:        # mp4/gif source: frames are float
                return source, driving    # already; aug still runs on device
            if self.transform is not None:
                source_aug = np.asarray(self.transform([video[0]])[0], np.float32)
                driving_aug = np.asarray(self.transform([video[1]])[0], np.float32)
            else:
                source_aug, driving_aug = source, driving
            return source, driving, source_aug, driving_aug
        return np.asarray(video, np.float32)         # [T,H,W,3] for eval


class DatasetRepeater:
    """I/O amortization (reference dataset.py:138-151)."""

    def __init__(self, dataset, num_repeats: int = 75):
        self.dataset = dataset
        self.num_repeats = num_repeats

    def __len__(self):
        return self.num_repeats * len(self.dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]


class PairedDataset:
    """Animation pairs from a CSV or a random index grid
    (reference dataset.py:154-193)."""

    def __init__(self, initial_dataset: FramesDataset, number_of_pairs: int, seed: int = 0):
        self.initial_dataset = initial_dataset
        pairs_list = initial_dataset.pairs_list
        rng = np.random.RandomState(seed)
        if pairs_list is None:
            max_idx = min(number_of_pairs, len(initial_dataset))
            xy = np.mgrid[:max_idx, :max_idx].reshape(2, -1).T
            number_of_pairs = min(xy.shape[0], number_of_pairs)
            self.pairs = xy[rng.choice(xy.shape[0], number_of_pairs, replace=False)]
        else:
            import pandas as pd
            videos = initial_dataset.videos
            name_to_index = {name: i for i, name in enumerate(videos)}
            pairs = pd.read_csv(pairs_list)
            pairs = pairs[np.logical_and(pairs["source"].isin(videos),
                                         pairs["driving"].isin(videos))]
            number_of_pairs = min(pairs.shape[0], number_of_pairs)
            self.pairs = [(name_to_index[pairs["driving"].iloc[i]],
                           name_to_index[pairs["source"].iloc[i]])
                          for i in range(number_of_pairs)]

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx):
        driving_idx, source_idx = self.pairs[idx]
        return {"driving_video": self.initial_dataset[driving_idx],
                "source_video": self.initial_dataset[source_idx]}
