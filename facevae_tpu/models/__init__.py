"""Model zoo (layer L3, reference models.py + trainer.py:16-129).

Active configuration (what training instantiates — reference trainer.py:8,
logger.py:52): EFE_conv5 (here EFEConv variant "conv5" with flatten_vae_nl),
AFE, CKD, HPE_EDE, MFE, Generator, Discriminator, plus the frozen Hopenet
pose teacher.  Dormant reference variants (EFE conv3/conv4, flatten_vae,
local_vae) are kept as configs; fully-linear EFEs and conv6 are catalogued
in models/VARIANTS.md.

All modules are flax.linen, channel-last ([N,H,W,C] / [N,D,H,W,C]); images
enter as [N,H,W,3] float32 in [0,1].
"""
from facevae_tpu.models.afe import AFE
from facevae_tpu.models.ckd import CKD
from facevae_tpu.models.hpe_ede import HPE_EDE
from facevae_tpu.models.vae import FlattenVAE_NL, FlattenVAE, LocalVAE
from facevae_tpu.models.efe import EFEConv
from facevae_tpu.models.mfe import MFE
from facevae_tpu.models.generator import Generator
from facevae_tpu.models.discriminator import Discriminator
from facevae_tpu.models.hopenet import Hopenet
from facevae_tpu.models.factory import build_models
