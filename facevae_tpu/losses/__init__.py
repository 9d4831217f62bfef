"""Loss library (layer L4, reference losses.py).

Pure functions where the reference had stateless modules; linen modules for
the two stateful ones (VGG feature extractors, SimSiam contrastive head).
Weights/semantics follow reference trainer.py:240-252 / losses.py exactly,
including catalogued quirks (q3 stale-pyramid, q7 frozen contrastive head)
behind config flags.
"""
from facevae_tpu.losses.gan import gan_loss_gen, gan_loss_dis, feature_matching_loss
from facevae_tpu.losses.keypoint import (
    equivariance_loss, keypoint_prior_loss, headpose_loss, deformation_prior_loss,
)
from facevae_tpu.losses.vae_losses import kl_divergence_loss, recon_loss
from facevae_tpu.losses.vgg import VGGFeatures, vgg19_taps, vggface_taps
from facevae_tpu.losses.perceptual import PerceptualLoss
from facevae_tpu.losses.contrastive import (ContrastiveHead, ContrastiveHeadConv,
                                            ContrastiveHeadConv2, contrastive_loss)
from facevae_tpu.losses.lpips import LPIPS
