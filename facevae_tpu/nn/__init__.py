"""Neural building blocks (layer L2, reference modules.py / models_utils.py).

flax.linen modules, channel-last layouts, torch-default initialization (so
fresh-init training statistically matches the reference's early loss curves).

Collections:
  'params'       — trainable weights
  'batch_stats'  — BatchNorm running mean/var
  'spectral'     — spectral-norm power-iteration vectors (u)
"""
from facevae_tpu.nn.init import torch_kernel_init, torch_bias_init
from facevae_tpu.nn.layers import (Conv, Dense, BatchNorm, InstanceNorm,
                                   fold_depth)
from facevae_tpu.nn.blocks import (
    ConvBlock,
    DownBlock2D, DownBlock3D,
    UpBlock2D, UpBlock3D,
    SameBlock2D, SameBlock3D,
    ResBlock2D, ResBlock3D,
    ResBottleneck,
)
from facevae_tpu.nn.elr import (LinearELR, Conv2dELR, ConvTranspose1dELR,
                                ConvTranspose2dELR, ConvTranspose3dELR,
                                UpSampleBlock3d)
from facevae_tpu.nn.wn import (LinearWN, Conv2dWN, ConvTranspose2dWN,
                               Conv2dUB, Conv2dWNUB, ConvTranspose2dUB,
                               ConvTranspose2dWNUB, Conv3dUB, ConvTranspose3dUB,
                               downsample2d, dilate2d, fuse_wn)
