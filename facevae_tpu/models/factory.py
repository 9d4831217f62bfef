"""Model factory: config -> module instances (the reference selects variants
by editing imports, trainer.py:7-11; here it is a config enum)."""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn

from facevae_tpu.config import ModelConfig
from facevae_tpu.models.afe import AFE
from facevae_tpu.models.ckd import CKD
from facevae_tpu.models.hpe_ede import HPE_EDE
from facevae_tpu.models.efe import EFEConv
from facevae_tpu.models.mfe import MFE
from facevae_tpu.models.generator import Generator
from facevae_tpu.models.discriminator import Discriminator


def build_models(cfg: ModelConfig, axis_name: Optional[str] = None) -> Dict[str, nn.Module]:
    """Instantiate the 6 generator-side nets + discriminator.

    Mirrors reference logger.py:52-53 g_models/d_models composition.
    """
    if cfg.efe_variant not in ("conv", "conv2", "conv3", "conv4", "conv5",
                               "conv6", "linear", "lin_conv"):
        raise ValueError(f"unsupported EFE variant {cfg.efe_variant!r} "
                         "(conv/conv2/conv3/conv4/conv5/conv6/linear/lin_conv;"
                         " see models/VARIANTS.md)")
    # rematerialization happens at the call boundary (train/objective.py
    # VarBank.apply(remat=True)) — jax.checkpoint over the whole apply with
    # static flags closed over; ModelConfig.remat gates it.
    _EFE, _CKD, _HPE, _MFE, _GEN, _DISC = (EFEConv, CKD, HPE_EDE, MFE,
                                           Generator, Discriminator)
    if cfg.efe_variant == "conv6":
        from facevae_tpu.models.efe_conv6 import EFEConv6
        efe = EFEConv6(D=cfg.depth, K=cfg.num_kp,
                       scale_factor=cfg.efe_scale_factor, use_vae=cfg.efe_use_vae,
                       use_weight_norm=cfg.use_weight_norm, axis_name=axis_name)
    elif cfg.efe_variant in ("linear", "lin_conv"):
        from facevae_tpu.models.efe_linear import EFELinear, efe_lin_conv_defaults
        kw = efe_lin_conv_defaults() if cfg.efe_variant == "lin_conv" else {}
        efe = EFELinear(K=cfg.num_kp, scale_factor=cfg.efe_scale_factor,
                        use_weight_norm=cfg.use_weight_norm, axis_name=axis_name,
                        **kw)
    else:
        efe = _EFE(variant=cfg.efe_variant, down_seq=tuple(cfg.efe_down_seq),
                   up_seq=tuple(cfg.efe_up_seq), D=cfg.depth, K=cfg.num_kp,
                   n_res=cfg.efe_n_res, scale_factor=cfg.efe_scale_factor,
                   use_vae=cfg.efe_use_vae, use_weight_norm=cfg.use_weight_norm,
                   axis_name=axis_name)
    return {
        "efe": efe,
        "afe": AFE(down_seq=tuple(cfg.afe_down_seq), n_res=cfg.afe_n_res,
                   C=cfg.app_channels, D=cfg.depth,
                   use_weight_norm=cfg.use_weight_norm, axis_name=axis_name),
        "ckd": _CKD(down_seq=tuple(cfg.ckd_down_seq), up_seq=tuple(cfg.ckd_up_seq),
                   D=cfg.depth, K=cfg.num_kp, scale_factor=cfg.ckd_scale_factor,
                   use_weight_norm=cfg.use_weight_norm, axis_name=axis_name),
        "hpe_ede": _HPE(n_filters=tuple(cfg.hpe_filters), n_blocks=tuple(cfg.hpe_blocks),
                           n_bins=cfg.n_bins, K=cfg.num_kp,
                           use_weight_norm=cfg.use_weight_norm, axis_name=axis_name),
        "mfe": _MFE(down_seq=tuple(cfg.mfe_down_seq), up_seq=tuple(cfg.mfe_up_seq),
                   K=cfg.num_kp, D=cfg.depth, C1=cfg.app_channels, C2=cfg.mfe_compress,
                   use_weight_norm=cfg.use_weight_norm, axis_name=axis_name),
        "generator": _GEN(up_seq=tuple(cfg.gen_up_seq), n_res=cfg.gen_n_res,
                               D=cfg.depth, C=cfg.app_channels,
                               use_weight_norm=cfg.gen_use_weight_norm, axis_name=axis_name),
        "discriminator": _DISC(down_seq=tuple(cfg.disc_down_seq), K=cfg.num_kp,
                                       use_weight_norm=cfg.disc_use_weight_norm,
                                       axis_name=axis_name),
    }
