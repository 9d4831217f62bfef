"""Objective composition — the model-side hot path (reference trainer.py:214-337).

`generator_forward` mirrors GeneratorFull.forward (trainer.py:267-317): one
AFE/CKD pass on the source, a TPS-warped driving frame for the equivariance
pair, HPE on the 3N concatenated batch, EFE three times, the MFE warp, the
generator decode, and two discriminator evaluations; returns the 10-entry
loss dict {P,G,F,E,L,H,D,C,K,R} with reference weights.

`discriminator_forward` mirrors DiscriminatorFull.forward (trainer.py:319-337).

Mutable module state (BN running stats, spectral-norm u/v) is threaded
sequentially through a VarBank so multiple applications of the same module in
one step see each other's updates — exactly torch's in-place buffer
semantics (e.g. EFE runs 3x per step, SURVEY.md §3.3).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from facevae_tpu.config import Config
from facevae_tpu.ops import (
    transform_kp, random_transform_params, transform_frame, warp_coordinates,
    apply_imagenet_normalization,
)
from facevae_tpu.ops.interpolate import interpolate_nearest_2d
from facevae_tpu.losses import (
    gan_loss_gen, gan_loss_dis, feature_matching_loss,
    equivariance_loss, keypoint_prior_loss, headpose_loss, deformation_prior_loss,
    kl_divergence_loss, recon_loss,
)


class VarBank:
    """Threads params + mutable collections through sequential model calls."""

    def __init__(self, params: Dict[str, Any], batch_stats: Dict[str, Any],
                 spectral: Dict[str, Any]):
        self.params = params
        self.batch_stats = dict(batch_stats)
        self.spectral = dict(spectral)

    def apply(self, name: str, model, *args, rngs=None, remat: bool = False, **kwargs):
        variables = {"params": self.params[name]}
        mutable = []
        if name in self.batch_stats:
            variables["batch_stats"] = self.batch_stats[name]
            mutable.append("batch_stats")
        if name in self.spectral:
            variables["spectral"] = self.spectral[name]
            mutable.append("spectral")

        def run(variables, *arr):
            # static flags (train/train_vae) and rngs are closed over
            return model.apply(variables, *arr, mutable=mutable or False,
                               rngs=rngs, **kwargs)

        if remat:
            # recompute this model's forward during backward: trades ~1/3 of
            # its FLOPs for its whole activation set (256² HBM fit).  Warp
            # outputs are tagged 'warp_out' and SAVED — recomputing the
            # gather-heavy warps costs far more than their small outputs.
            run = jax.checkpoint(
                run, policy=jax.checkpoint_policies.save_only_these_names("warp_out"))
        if mutable:
            out, updates = run(variables, *args)
            if "batch_stats" in updates:
                self.batch_stats[name] = updates["batch_stats"]
            if "spectral" in updates:
                self.spectral[name] = updates["spectral"]
            return out
        return run(variables, *args)

    def collections(self):
        return self.batch_stats, self.spectral


def _chunk3(x):
    n = x.shape[0] // 3
    return x[:n], x[n:2 * n], x[2 * n:]


def generator_forward(models: Dict[str, Any], teachers: Dict[str, Any],
                      bank: VarBank, cfg: Config,
                      s, d, s_a, d_a, rng: jax.Array,
                      train_vae: bool = False, train: bool = True,
                      transform_params=None,
                      ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Full generator-side forward.  Returns (loss dict, aux visuals dict).

    Mixed precision (ModelConfig.compute_dtype="bfloat16"): conv stacks run in
    bf16 (params stay fp32 — Conv casts per-call); all geometry (keypoints,
    rotation matrices, warp coordinates, softmax heatmaps) and every loss
    reduction stay fp32.
    """
    w = cfg.loss
    N = s.shape[0]
    cdt = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    rng_tps, rng_noise = jax.random.split(rng)

    s_c, d_c = s.astype(cdt), d.astype(cdt)
    s_a = s_a.astype(cdt) if s_a is not None else None
    d_a = d_a.astype(cdt) if d_a is not None else None

    rm = cfg.model.remat
    fs = bank.apply("afe", models["afe"], s_c, train=train)
    kp_c = bank.apply("ckd", models["ckd"], s_c, train=train, remat=rm)

    # transform_params override: parity harnesses replay the reference's
    # Transform noise (trainer.py:270) instead of drawing fresh TPS params
    tp = transform_params
    if tp is None:
        tp = random_transform_params(rng_tps, N, sigma_affine=cfg.train.sigma_affine,
                                     sigma_tps=cfg.train.sigma_tps,
                                     points_tps=cfg.train.points_tps, dtype=jnp.float32)
    # bf16 mode warps on the MXU (one-hot path in transform_frame, on par
    # with the model's activation precision) when the Pallas plan fits;
    # otherwise (fp32 / CPU) the exact fp32 gather runs
    transformed_d = transform_frame(tp, d.astype(jnp.float32),
                                    compute_dtype=cdt)
    cated = jnp.concatenate([s_c, d_c, transformed_d.astype(cdt)], axis=0)

    yaw, pitch, roll, t, scale = bank.apply("hpe_ede", models["hpe_ede"], cated,
                                             train=train, remat=rm)
    t_s, t_d, t_tran = _chunk3(t)
    scale_s, scale_d, scale_tran = _chunk3(scale)
    yaw_s, yaw_d, yaw_tran = _chunk3(yaw)
    pitch_s, pitch_d, pitch_tran = _chunk3(pitch)
    roll_s, roll_d, roll_tran = _chunk3(roll)

    # frozen pose teacher on nearest-resized 224² imagenet-normalized input
    # (reference trainer.py:278-280; F.interpolate default mode is NEAREST)
    hp_in = interpolate_nearest_2d(apply_imagenet_normalization(cated), (224, 224))
    real_yaw, real_pitch, real_roll = models["hopenet"].apply(
        teachers["hopenet"], jax.lax.stop_gradient(hp_in), train=False)

    kp_s_old, Rs = transform_kp(kp_c, yaw_s, pitch_s, roll_s, t_s, scale_s)
    kp_d_old, Rd = transform_kp(kp_c, yaw_d, pitch_d, roll_d, t_d, scale_d)
    transformed_kp_old, _ = transform_kp(kp_c, yaw_tran, pitch_tran, roll_tran,
                                         t_tran, scale_tran)

    noise_rngs = {"noise": rng_noise}
    kp_s, x_c_s, x_a_c_s, kl_s, l2_s = bank.apply(
        "efe", models["efe"], s_c, s_a, kp_s_old, train_vae=False, train=train,
        remat=rm)
    kp_d, x_c_d, x_a_c_d, kl_d, l2_d = bank.apply(
        "efe", models["efe"], d_c, d_a, kp_d_old, train_vae=train_vae, train=train,
        rngs=noise_rngs if train_vae else None, remat=rm)
    transformed_kp, *_ = bank.apply(
        "efe", models["efe"], transformed_d.astype(cdt), None, transformed_kp_old,
        train_vae=False, train=train, remat=rm)

    reverse_kp = warp_coordinates(tp, transformed_kp[:, :, :2])
    deformation, occlusion, mask = bank.apply(
        "mfe", models["mfe"], fs, kp_s, kp_d, Rs, Rd, train=train, remat=rm)
    generated_d = bank.apply("generator", models["generator"], fs, deformation,
                             occlusion, train=train, remat=rm).astype(jnp.float32)
    output_d, features_d = bank.apply("discriminator", models["discriminator"],
                                      d_c, kp_d, train=train, remat=rm)
    output_gd, features_gd = bank.apply("discriminator", models["discriminator"],
                                        generated_d.astype(cdt), kp_d, train=train,
                                        remat=rm)

    if cfg.model.remat:
        # VGG towers hold the largest single activation set; recompute them
        # in the backward pass
        p_apply = jax.checkpoint(
            lambda v, a, b: models["perceptual"].apply(v, a, b))
    else:
        p_apply = models["perceptual"].apply
    losses = {
        "P": w.perceptual * p_apply(
            teachers["perceptual"], generated_d.astype(cdt), d_c),
        "G": w.gan * gan_loss_gen(output_gd),
        "F": w.feature_matching * feature_matching_loss(features_gd, features_d),
        "E": w.equivariance * equivariance_loss(kp_d, reverse_kp),
        "L": w.keypoint_prior * keypoint_prior_loss(kp_d, w.kp_prior_dt, w.kp_prior_zt),
        "H": w.headpose * headpose_loss(yaw, pitch, roll, real_yaw, real_pitch, real_roll),
        # quirk q11: the D prior penalizes EFE's deviation from pose-only kp
        "D": w.deformation_prior * deformation_prior_loss(kp_d_old - kp_d),
    }
    if x_c_d is not None:
        losses["C"] = w.contrastive * bank.apply(
            "contrastive", models["contrastive"], x_c_d, x_a_c_d, train=train)
    else:
        losses["C"] = jnp.zeros((), jnp.float32)
    if train_vae and kl_d[0] is not None:
        losses["K"] = w.kl * kl_divergence_loss(kl_d[0], kl_d[1])
    else:
        losses["K"] = jnp.zeros((), jnp.float32)
    if l2_d[0] is not None:
        losses["R"] = w.recon * recon_loss(d, generated_d)
    else:
        losses["R"] = jnp.zeros((), jnp.float32)

    aux = {
        "generated_d": generated_d,
        "transformed_d": transformed_d,
        "kp_s": kp_s,
        "kp_d": kp_d,
        "transformed_kp": transformed_kp,
        "occlusion": occlusion.astype(jnp.float32),
        # depth-summed display form [N,h,w,K+1]: the visualizer only shows
        # the depth sum, and the full [N,D,h,w,K+1] volume is ~33 MB fp32 at
        # batch 8 — 16x the scan-carry and device->host cost for no signal
        "mask": mask.sum(axis=1),
    }
    return losses, aux


def discriminator_forward(models: Dict[str, Any], bank: VarBank, cfg: Config,
                          d, generated_d, kp_d, train: bool = True
                          ) -> Dict[str, jnp.ndarray]:
    """Discriminator-side hinge losses (reference trainer.py:330-337)."""
    cdt = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    rm = cfg.model.remat
    output_d, _ = bank.apply("discriminator", models["discriminator"],
                             d.astype(cdt), jax.lax.stop_gradient(kp_d), train=train,
                             remat=rm)
    output_gd, _ = bank.apply("discriminator", models["discriminator"],
                              jax.lax.stop_gradient(generated_d).astype(cdt),
                              jax.lax.stop_gradient(kp_d), train=train, remat=rm)
    return {
        "G1": cfg.loss.gan * gan_loss_dis(output_gd, t_real=False),
        "G2": cfg.loss.gan * gan_loss_dis(output_d, t_real=True),
    }
