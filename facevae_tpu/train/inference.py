"""Batched inference graphs (reference evaluate.py, FIXED — quirk q1: the
reference unpacks 2 of MFE's 3 outputs and omits EFE entirely).

Modes:
  reconstruct    — animate source frame with driving frames' motion
  frontalize     — re-pose every frame to zero yaw/pitch/roll
  reenact        — cross-identity: source image + driving sequence
  sample/interp  — draw/interpolate EFE expression latents (BASELINE configs[5])

All functions are jitted once and reused across frames; use_efe=True runs the
full trained pipeline (EFE refines the pose-only keypoints), use_efe=False
reproduces the reference's pre-EFE face-vid2vid path.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from facevae_tpu.config import Config
from facevae_tpu.ops import transform_kp, transform_kp_with_new_pose
from facevae_tpu.train.objective import VarBank
from facevae_tpu.train.state import TrainState, build_all_modules


class InferencePipeline:
    def __init__(self, cfg: Config, state: TrainState, use_efe: bool = True):
        self.cfg = cfg
        self.models = build_all_modules(cfg)
        self.state = state
        self.use_efe = use_efe
        self._vars = {}
        for name in ("afe", "ckd", "hpe_ede", "efe", "mfe", "generator"):
            v = {"params": state.g_params[name]}
            if name in state.batch_stats:
                v["batch_stats"] = state.batch_stats[name]
            if name in state.spectral:
                v["spectral"] = state.spectral[name]
            self._vars[name] = v

    def _apply(self, name, *args, **kwargs):
        return self.models[name].apply(self._vars[name], *args, train=False, **kwargs)

    def _jit(self, fn):
        """jit with the variable trees as ARGUMENTS, not closure constants.

        Closing over self._vars inlines every weight as a literal in the
        compiled program — at the flagship config the serialized compile
        request exceeds the remote-compile helper's body limit (HTTP 413)
        and defeats weight-donation/caching.  fn receives a `vars` dict and
        an `apply(name, ...)` helper bound to it."""
        jitted = jax.jit(fn)

        def call(*args, **kwargs):
            return jitted(self._vars, *args, **kwargs)

        return call

    def _bound_apply(self, variables):
        def apply(name, *args, **kwargs):
            return self.models[name].apply(variables[name], *args,
                                           train=False, **kwargs)
        return apply

    @functools.cached_property
    def encode_source(self):
        """source image -> (fs, kp_c, kp_s, Rs)"""
        def fn(variables, s):
            apply = self._bound_apply(variables)
            fs = apply("afe", s)
            kp_c = apply("ckd", s)
            yaw, pitch, roll, t, scale = apply("hpe_ede", s)
            kp_s_old, Rs = transform_kp(kp_c, yaw, pitch, roll, t, scale)
            if self.use_efe:
                kp_s, *_ = apply("efe", s, None, kp_s_old)
            else:
                kp_s = kp_s_old
            return fs, kp_c, kp_s, Rs
        return self._jit(fn)

    @functools.cached_property
    def drive_frame(self):
        """(fs, kp_c, kp_s, Rs, driving frame) -> generated image"""
        def fn(variables, fs, kp_c, kp_s, Rs, img):
            apply = self._bound_apply(variables)
            yaw, pitch, roll, t, scale = apply("hpe_ede", img)
            kp_d_old, Rd = transform_kp(kp_c, yaw, pitch, roll, t, scale)
            if self.use_efe:
                kp_d, *_ = apply("efe", img, None, kp_d_old)
            else:
                kp_d = kp_d_old
            deformation, occlusion, _ = apply("mfe", fs, kp_s, kp_d, Rs, Rd)
            return apply("generator", fs, deformation, occlusion)
        return self._jit(fn)

    @functools.cached_property
    def drive_batch(self):
        """(fs, kp_c, kp_s, Rs from ONE source; [B] driving frames) -> [B]
        generated images.  The source encodings are broadcast across the
        batch ON DEVICE, so quantitative eval (evaluate.py mode m) drives B
        frames per dispatch instead of paying a tunnel round trip per frame.
        Fixed B per compilation — callers pad the last chunk."""
        def fn(variables, fs, kp_c, kp_s, Rs, imgs):
            b = imgs.shape[0]

            def tile(x):
                return jnp.broadcast_to(x, (b,) + x.shape[1:])

            apply = self._bound_apply(variables)
            yaw, pitch, roll, t, scale = apply("hpe_ede", imgs)
            kp_d_old, Rd = transform_kp(tile(kp_c), yaw, pitch, roll, t, scale)
            if self.use_efe:
                kp_d, *_ = apply("efe", imgs, None, kp_d_old)
            else:
                kp_d = kp_d_old
            deformation, occlusion, _ = apply(
                "mfe", tile(fs), tile(kp_s), kp_d, tile(Rs), Rd)
            return apply("generator", tile(fs), deformation, occlusion)
        return self._jit(fn)

    @functools.cached_property
    def frontalize_frame(self):
        """frame -> frontalized frame (zero pose, reference evaluate.py:46-66)."""
        def fn(variables, img):
            apply = self._bound_apply(variables)
            fs = apply("afe", img)
            kp_c = apply("ckd", img)
            yaw, pitch, roll, t, scale = apply("hpe_ede", img)
            kp_s_old, Rs = transform_kp(kp_c, yaw, pitch, roll, t, scale)
            if self.use_efe:
                kp_s, *_ = apply("efe", img, None, kp_s_old)
                delta = kp_s - kp_s_old
            else:
                kp_s = kp_s_old
                delta = jnp.zeros_like(kp_s)
            zero = jnp.zeros_like(yaw)
            # scale is [N,1,1,1] (HPE head shape); reduce to [N,1,1] so the
            # product keeps kp rank [N,K,3]
            kp_d, Rd = transform_kp_with_new_pose(kp_c * scale.reshape(-1, 1, 1),
                                                  yaw, pitch, roll, t,
                                                  delta, zero, zero, zero)
            deformation, occlusion, _ = apply("mfe", fs, kp_s, kp_d, Rs, Rd)
            return apply("generator", fs, deformation, occlusion)
        return self._jit(fn)

    @functools.cached_property
    def sample_expression(self):
        """(frame, key, temperature) -> image with resampled EFE latent.

        Runs EFE in train_vae mode with injected noise: z = mu + exp(logstd)*eps.
        """
        def fn(variables, img, key, temperature):
            apply = self._bound_apply(variables)
            fs = apply("afe", img)
            kp_c = apply("ckd", img)
            yaw, pitch, roll, t, scale = apply("hpe_ede", img)
            kp_old, Rs = transform_kp(kp_c, yaw, pitch, roll, t, scale)
            kp_s, *_ = apply("efe", img, None, kp_old)
            kp_d, *_ = self.models["efe"].apply(
                variables["efe"], img, None, kp_old, train_vae=True, train=False,
                rngs={"noise": key})
            kp_d = kp_s + temperature * (kp_d - kp_s)
            deformation, occlusion, _ = apply("mfe", fs, kp_s, kp_d, Rs, Rs)
            return apply("generator", fs, deformation, occlusion)
        return self._jit(fn)

    @functools.cached_property
    def interpolate_expression(self):
        """(source frame, target frame, alpha) -> image with kp lerped between
        the two frames' expressions (latent interpolation graph)."""
        def fn(variables, s, d, alpha):
            apply = self._bound_apply(variables)
            fs = apply("afe", s)
            kp_c = apply("ckd", s)
            yaw, pitch, roll, t, scale = apply("hpe_ede", jnp.concatenate([s, d]))
            n = s.shape[0]
            kp_s_old, Rs = transform_kp(kp_c, yaw[:n], pitch[:n], roll[:n], t[:n], scale[:n])
            kp_d_old, Rd = transform_kp(kp_c, yaw[n:], pitch[n:], roll[n:], t[n:], scale[n:])
            kp_s, *_ = apply("efe", s, None, kp_s_old)
            kp_d, *_ = apply("efe", d, None, kp_d_old)
            kp_mix = (1 - alpha) * kp_s + alpha * kp_d
            deformation, occlusion, _ = apply("mfe", fs, kp_s, kp_mix, Rs, Rd)
            return apply("generator", fs, deformation, occlusion)
        return self._jit(fn)
