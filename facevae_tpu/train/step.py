"""The jitted train step: G update then D update in one XLA program.

Replaces the reference hot loop body (logger.py:150-172): zero grads ->
g_full forward/backward -> 6 Adam steps -> d_full forward/backward -> 1 Adam
step.  Here both phases live in ONE jit so XLA fuses and pipelines them; the
whole step runs on device with donated state (no host round-trips — the
reference syncs losses to CPU every iteration, logger.py:173).

Data parallelism: the step is wrapped in shard_map over a 1-axis mesh.
Per-shard gradients are lax.pmean'd over ICI (DDP parity), BN statistics are
pmean'd inside the modules (SyncBN parity), and the per-device RNG is folded
with the axis index so TPS draws and VAE noise differ per shard (the
reference seeds each rank differently, distributed.py:11).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from facevae_tpu.config import Config
from facevae_tpu.parallel import DATA_AXIS
from facevae_tpu.train.objective import VarBank, generator_forward, discriminator_forward
from facevae_tpu.train.state import TrainState, build_all_modules, make_optimizers


def make_train_step(cfg: Config, mesh: Optional[Mesh] = None,
                    models: Optional[Dict[str, Any]] = None,
                    train_vae: Optional[bool] = None, donate: bool = True,
                    fused_aug: bool = False, raw: bool = False):
    """Returns (models, step_fn) with step_fn(state, batch, rng) -> (state, metrics).

    batch = (s, d, s_a, d_a), each [N,H,W,3] channel-last float32 — with a
    mesh, N is the GLOBAL batch and inputs are sharded over DATA_AXIS.

    fused_aug: batch is just (s, d) — uint8 straight from the PNG decoder or
    float32 — and the contrastive augmented views are computed INSIDE the
    step (one dispatch, no separate aug program, 4x less host->device traffic
    for the uint8 case).  The reference ships float32 CHW through its
    DataLoader and augments on CPU workers (train.py:16, dataset.py:121-126).
    """
    axis = DATA_AXIS if mesh is not None else None
    models = models or build_all_modules(cfg, axis_name=axis)
    g_tx, d_tx = make_optimizers(cfg)
    tv = cfg.train.train_vae if train_vae is None else train_vae
    # Quirk q7: the reference never steps the SimSiam head (logger.py:60-61).
    # When train_contrastive_head is set, the head joins the differentiated
    # tree AND the generator optimizer (whose state was init'd to match in
    # create_train_state).
    train_head = cfg.loss.train_contrastive_head

    def step(state: TrainState, batch, rng,
             transform_params=None) -> Tuple[TrainState, Dict[str, Any]]:
        # transform_params: parity harnesses replay the reference Transform
        # noise (trainer.py:270) instead of drawing TPS params from rng
        if fused_aug:
            from facevae_tpu.data.device_aug import augment_batch
            s, d = batch
            if s.dtype == jnp.uint8:
                s = s.astype(jnp.float32) / 255.0
                d = d.astype(jnp.float32) / 255.0
            if axis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            k_aug = jax.random.fold_in(rng, 0xA06)
            s_a = augment_batch(jax.random.fold_in(k_aug, 0), s, cfg.data)
            d_a = augment_batch(jax.random.fold_in(k_aug, 1), d, cfg.data)
            # the aug views are DATA (no param dependence); stop_gradient
            # keeps the VJP from retaining the warp/jitter intermediates
            s_a = jax.lax.stop_gradient(s_a)
            d_a = jax.lax.stop_gradient(d_a)
        else:
            s, d, s_a, d_a = batch
            if axis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        # ---- generator phase -------------------------------------------------
        g_opt_params = dict(state.g_params)
        if train_head:
            g_opt_params["contrastive"] = state.c_params["contrastive"]

        def g_loss_fn(opt_params):
            c_params = ({"contrastive": opt_params["contrastive"]} if train_head
                        else state.c_params)
            params = {**opt_params, **state.d_params, **c_params}
            bank = VarBank(params, state.batch_stats, state.spectral)
            losses, aux = generator_forward(models, state.teachers, bank, cfg,
                                            s, d, s_a, d_a, rng, train_vae=tv,
                                            transform_params=transform_params)
            total = sum(losses.values())
            stats, spectral = bank.collections()
            return total, (losses, aux, stats, spectral)

        (g_total, (losses_g, aux, stats, spectral)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_opt_params)
        if axis is not None:
            g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, g_opt_params)
        new_opt_params = jax.tree.map(lambda p, u: p + u, g_opt_params, g_updates)
        if train_head:
            c_params = {"contrastive": new_opt_params.pop("contrastive")}
        else:
            c_params = state.c_params
        g_params = new_opt_params

        # ---- discriminator phase --------------------------------------------
        generated_d = jax.lax.stop_gradient(aux["generated_d"])
        kp_d = jax.lax.stop_gradient(aux["kp_d"])

        def d_loss_fn(d_params):
            params = {**g_params, **d_params, **c_params}
            bank = VarBank(params, stats, spectral)
            losses = discriminator_forward(models, bank, cfg, d, generated_d, kp_d)
            st2, sp2 = bank.collections()
            return sum(losses.values()), (losses, st2, sp2)

        (d_total, (losses_d, stats, spectral)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        if axis is not None:
            d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = jax.tree.map(lambda p, u: p + u, state.d_params, d_updates)

        new_state = state.replace(
            g_params=g_params, d_params=d_params, c_params=c_params,
            batch_stats=stats, spectral=spectral,
            g_opt=g_opt, d_opt=d_opt, step=state.step + 1)

        metrics_g = losses_g
        metrics_d = losses_d
        if axis is not None:
            metrics_g = jax.lax.pmean(metrics_g, axis)
            metrics_d = jax.lax.pmean(metrics_d, axis)
        return new_state, {"losses_g": metrics_g, "losses_d": metrics_d, "aux": aux}

    if raw:
        # uncompiled body — for callers embedding the step in a larger
        # program (the multi-step lax.scan dispatcher, train/scan.py).  With
        # a mesh the body already contains the pmean/axis_index collectives
        # for DATA_AXIS; the caller owns the shard_map wrapping.
        return models, step
    if mesh is None:
        return models, jax.jit(step, donate_argnums=(0,) if donate else ())

    state_spec = P()        # params/opt replicated
    batch_spec = tuple(P(DATA_AXIS) for _ in range(2 if fused_aug else 4))
    out_metric_spec = {"losses_g": P(), "losses_d": P(),
                       "aux": jax.tree.map(lambda _: P(DATA_AXIS), _AUX_TEMPLATE)}
    donate_kw = dict(donate_argnums=(0,) if donate else ())
    sharded = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(state_spec, batch_spec, P()),
        out_specs=(state_spec, out_metric_spec),
        check_vma=False,
    ), **donate_kw)
    # TPS-noise-replay variant (parity harnesses / the multichip dryrun):
    # per-sample params shard with the batch, control points replicate
    from facevae_tpu.ops.tps import TransformParams
    tp_spec = TransformParams(P(DATA_AXIS), P(), P(DATA_AXIS))
    sharded_tp = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(state_spec, batch_spec, P(), tp_spec),
        out_specs=(state_spec, out_metric_spec),
        check_vma=False,
    ), **donate_kw)

    def dispatch(state, batch, rng, transform_params=None):
        if transform_params is None:
            return sharded(state, batch, rng)
        return sharded_tp(state, batch, rng, transform_params)

    return models, dispatch


_AUX_TEMPLATE = {
    "generated_d": 0, "transformed_d": 0, "kp_s": 0, "kp_d": 0,
    "transformed_kp": 0, "occlusion": 0, "mask": 0,
}
