"""VGG feature extractors for the perceptual loss (reference losses.py:34-120).

The reference downloads torchvision VGG19 and Oxford VGG-Face-16 weights at
construction (losses.py:55-56,80-81).  This environment has no egress, so:
  - architectures are implemented here (conv/relu/maxpool stacks with named
    relu taps);
  - tools/convert_torch_weights.py converts downloaded .pth files into a
    local .npz when the user provides them (losses.LossConfig.pretrained_dir);
  - otherwise parameters are deterministic random init — the perceptual loss
    is then a random-projection feature loss (a fixed random VGG is still a
    useful perceptual metric and keeps the training graph identical).

TPU note: the stack STOPS at the deepest tap (relu_5_1) instead of running
the full torchvision `.features` like the reference does — identical outputs,
less wasted compute.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn

from facevae_tpu.nn import Conv
from facevae_tpu.ops.interpolate import max_pool_2d

# (block convs) per VGG flavour; taps name the relu after the first conv of
# each block, mirroring losses.py layer_name_mapping.
VGG19_BLOCKS: Tuple[Tuple[int, ...], ...] = ((64, 64), (128, 128), (256, 256, 256, 256),
                                             (512, 512, 512, 512), (512,))
VGG16_BLOCKS: Tuple[Tuple[int, ...], ...] = ((64, 64), (128, 128), (256, 256, 256),
                                             (512, 512, 512), (512,))


def vgg19_taps() -> Sequence[str]:
    return ("relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1", "relu_5_1")


def vggface_taps() -> Sequence[str]:
    return ("relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1", "relu_5_1")


class VGGFeatures(nn.Module):
    """Frozen VGG conv stack with relu_i_1 taps, truncated at the last tap.

    Only the first conv of block 5 is kept (relu_5_1 is the deepest layer the
    perceptual loss reads).
    """

    blocks: Tuple[Tuple[int, ...], ...] = VGG19_BLOCKS

    @nn.compact
    def __call__(self, x) -> Dict[str, nn.Module]:
        taps = {}
        for bi, widths in enumerate(self.blocks):
            if bi > 0:
                x = max_pool_2d(x, 2, 2, 0)
            for ci, width in enumerate(widths):
                x = Conv(width, 3, 1, 1, dim=2, name=f"conv{bi + 1}_{ci + 1}")(x)
                x = nn.relu(x)
                if ci == 0:
                    taps[f"relu_{bi + 1}_1"] = x
        return taps
