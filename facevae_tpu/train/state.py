"""TrainState pytree + initialization.

Replaces the constructor half of the reference Logger (logger.py:51-63):
builds all sub-models, the frozen teachers, per-sub-model Adam states, and
packs everything into one pytree that the jitted train step consumes.

Optimizer note: the reference uses one Adam per sub-model (logger.py:60-61).
Adam has no cross-parameter coupling, so a single optax.adam over the
combined tree produces bit-identical updates; states are still stored
per-sub-model-addressable because params keep their {name: subtree} nesting.

Quirk q7 parity: the SimSiam contrastive head's parameters are trainable
modules with no optimizer in the reference.  Here they are excluded from the
generator optimizer unless LossConfig.train_contrastive_head=True (their BN
running stats still update every step, as in the reference).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from facevae_tpu.config import Config
from facevae_tpu.models import build_models
from facevae_tpu.models.hopenet import Hopenet
from facevae_tpu.losses import PerceptualLoss, ContrastiveHead

G_MODEL_NAMES = ("efe", "afe", "ckd", "hpe_ede", "mfe", "generator")
D_MODEL_NAMES = ("discriminator",)


class TrainState(struct.PyTreeNode):
    g_params: Dict[str, Any]
    d_params: Dict[str, Any]
    c_params: Dict[str, Any]          # contrastive head (frozen by default, q7)
    teachers: Dict[str, Any]          # hopenet vars, perceptual vars (frozen)
    batch_stats: Dict[str, Any]
    spectral: Dict[str, Any]
    g_opt: Any
    d_opt: Any
    epoch: jnp.ndarray
    step: jnp.ndarray


def build_all_modules(cfg: Config, axis_name: Optional[str] = None) -> Dict[str, Any]:
    """The 7 trainable nets + frozen teachers + contrastive head."""
    models = build_models(cfg.model, axis_name=axis_name)
    models["hopenet"] = Hopenet()
    models["perceptual"] = PerceptualLoss(n_scales=cfg.loss.n_scales,
                                          fixed_pyramid=cfg.loss.fixed_pyramid)
    models["contrastive"] = ContrastiveHead(axis_name=axis_name)
    return models


def make_optimizers(cfg: Config):
    t = cfg.train
    g_tx = optax.adam(t.lr, b1=t.adam_b1, b2=t.adam_b2)
    d_tx = optax.adam(t.lr, b1=t.adam_b1, b2=t.adam_b2)
    return g_tx, d_tx


_NAME_IDS = {n: i for i, n in enumerate(
    ("afe", "ckd", "hpe_ede", "efe", "mfe", "generator", "discriminator",
     "hopenet", "perceptual", "contrastive"))}


def init_all_variables(models: Dict[str, Any], cfg: Config, seed: int = 0) -> Dict[str, Any]:
    """Initialize every module with shape-correct dummy inputs.

    Called under jit by create_train_state (eager per-op dispatch through the
    TPU tunnel makes module-by-module init take minutes; one compiled program
    takes seconds).  Porting code (utils_port order-zip, checkpoint/teacher
    converters) must call this EAGERLY instead: the jit pytree round-trip
    re-sorts dict keys, destroying the creation order the order-zip relies on.
    """
    m = cfg.model
    key = jax.random.PRNGKey(seed)
    N = 1
    img = jnp.zeros((N, m.image_size, m.image_size, 3), jnp.float32)
    kp = jnp.zeros((N, m.num_kp, 3), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (N, 3, 3))
    Hq = m.image_size // 4

    def init(name, *args, **kwargs):
        k = jax.random.fold_in(key, _NAME_IDS[name])
        return models[name].init({"params": k, "noise": jax.random.fold_in(k, 7)},
                                 *args, **kwargs)

    variables: Dict[str, Any] = {}
    variables["afe"] = init("afe", img)
    variables["ckd"] = init("ckd", img)
    variables["hpe_ede"] = init("hpe_ede", img)
    variables["efe"] = init("efe", img, img, kp)
    fs = jnp.zeros((N, m.depth, Hq, Hq, m.app_channels), jnp.float32)
    variables["mfe"] = init("mfe", fs, kp, kp, eye, eye)
    deform = jnp.zeros((N, m.depth, Hq, Hq, 3), jnp.float32)
    occ = jnp.zeros((N, Hq, Hq, 1), jnp.float32)
    variables["generator"] = init("generator", fs, deform, occ)
    variables["discriminator"] = init("discriminator", img, kp)
    variables["hopenet"] = init("hopenet", jnp.zeros((N, 224, 224, 3), jnp.float32))
    variables["perceptual"] = init("perceptual", img, img)
    feat_dim = (m.image_size // 64) ** 2 * m.efe_down_seq[-1]
    variables["contrastive"] = init("contrastive",
                                    jnp.zeros((2, feat_dim), jnp.float32),
                                    jnp.zeros((2, feat_dim), jnp.float32))
    return variables


def create_train_state(cfg: Config, seed: int = 0,
                       axis_name: Optional[str] = None,
                       models: Optional[Dict[str, Any]] = None) -> TrainState:
    """Initialize every module with shape-correct dummy inputs.

    The whole init runs as ONE jitted program: eager per-op dispatch through
    the TPU tunnel makes module-by-module init take minutes, one compiled
    program takes seconds.
    """
    m = cfg.model
    models = models or build_all_modules(cfg, axis_name=axis_name)
    variables = jax.jit(lambda: init_all_variables(models, cfg, seed))()
    g_params = {n: variables[n]["params"] for n in G_MODEL_NAMES}
    d_params = {n: variables[n]["params"] for n in D_MODEL_NAMES}
    c_params = {"contrastive": variables["contrastive"]["params"]}
    teachers = {"hopenet": variables["hopenet"],
                "perceptual": variables["perceptual"]}
    if cfg.loss.pretrained_dir:
        from facevae_tpu.losses.pretrained import load_pretrained
        teachers = load_pretrained(teachers, cfg.loss.pretrained_dir)
    batch_stats = {n: v["batch_stats"] for n, v in variables.items()
                   if "batch_stats" in v and n not in ("hopenet", "perceptual")}
    spectral = {n: v["spectral"] for n, v in variables.items() if "spectral" in v}

    g_tx, d_tx = make_optimizers(cfg)
    g_opt_params = dict(g_params)
    if cfg.loss.train_contrastive_head:
        g_opt_params["contrastive"] = c_params["contrastive"]
    return TrainState(
        g_params=g_params, d_params=d_params, c_params=c_params,
        teachers=teachers, batch_stats=batch_stats, spectral=spectral,
        g_opt=g_tx.init(g_opt_params), d_opt=d_tx.init(d_params),
        epoch=jnp.zeros((), jnp.int32), step=jnp.zeros((), jnp.int32),
    )
