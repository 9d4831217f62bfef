"""Data pipeline (layer L1, reference dataset.py + augmentation.py).

Two augmentation paths:
  - augmentation.py: CPU parity path (numpy/cv2/PIL), clip-consistent params,
    mirrors the reference's active pipeline (rotation ±30°, perspective warp,
    color jitter 0.1) — used for parity testing and as the default offline path.
  - device_aug.py: fused on-device JAX path — the north-star replacement that
    runs the same transforms as one XLA program on TPU (rotation+perspective
    collapse into a single homography grid_sample), leaving the CPU loader to
    do only decode+batch.

Frames are channel-last float32 [H,W,3] in [0,1] throughout.
"""
from facevae_tpu.data.dataset import FramesDataset, DatasetRepeater, PairedDataset, read_video
from facevae_tpu.data.augmentation import AllAugmentationTransform
from facevae_tpu.data.loader import PrefetchLoader
