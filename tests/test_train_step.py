"""End-to-end train-step tests at the tiny config.

- single-device: losses finite, params actually move, BN stats update
- 8-device CPU mesh: DP step runs; grads pmean'd -> params stay replicated;
  loss decreases over a few steps on a fixed batch (overfit sanity)
- determinism: same seed -> identical metrics
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facevae_tpu.config import tiny_config
from facevae_tpu.parallel import make_mesh
from facevae_tpu.train import create_train_state, make_train_step


def _batch(rng, n, size):
    return tuple(jnp.asarray(rng.rand(n, size, size, 3), jnp.float32) for _ in range(4))


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


def test_single_device_step(cfg, rng):
    state = create_train_state(cfg, seed=0)
    _, step = make_train_step(cfg, donate=False)
    batch = _batch(rng, 2, cfg.model.image_size)
    key = jax.random.PRNGKey(0)

    p0 = jax.tree.map(lambda x: x.copy(), state.g_params)
    state2, metrics = step(state, batch, key)
    for k, v in {**metrics["losses_g"], **metrics["losses_d"]}.items():
        assert np.isfinite(float(v)), f"loss {k} not finite"
    assert set(metrics["losses_g"]) == {"P", "G", "F", "E", "L", "H", "D", "C", "K", "R"}
    assert float(metrics["losses_g"]["K"]) == 0.0       # train_vae off (quirk q8)
    assert int(state2.step) == 1

    # params moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, state2.g_params)
    assert max(jax.tree.leaves(moved)) > 0
    # BN stats updated
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.batch_stats, state2.batch_stats)
    assert max(jax.tree.leaves(diff)) > 0


def test_contrastive_head_frozen_by_default(cfg, rng):
    """Quirk q7 parity: SimSiam head params receive no updates by default."""
    state = create_train_state(cfg, seed=0)
    _, step = make_train_step(cfg, donate=False)
    state2, _ = step(state, _batch(rng, 2, cfg.model.image_size), jax.random.PRNGKey(0))
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.c_params, state2.c_params)
    assert max(jax.tree.leaves(diff)) == 0.0


def test_contrastive_head_trains_when_enabled(cfg, rng):
    import dataclasses
    cfg2 = dataclasses.replace(cfg, loss=dataclasses.replace(
        cfg.loss, train_contrastive_head=True))
    state = create_train_state(cfg2, seed=0)
    _, step = make_train_step(cfg2, donate=False)
    state2, metrics = step(state, _batch(rng, 2, cfg2.model.image_size),
                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["losses_g"]["C"]))
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.c_params, state2.c_params)
    assert max(jax.tree.leaves(diff)) > 0.0
    # a second step must also work (optimizer state tree stays consistent)
    state3, _ = step(state2, _batch(rng, 2, cfg2.model.image_size),
                     jax.random.PRNGKey(1))
    assert int(state3.step) == 2


def test_determinism(cfg, rng):
    batch = _batch(rng, 2, cfg.model.image_size)
    key = jax.random.PRNGKey(3)
    outs = []
    for _ in range(2):
        state = create_train_state(cfg, seed=0)
        _, step = make_train_step(cfg, donate=False)
        _, m = step(state, batch, key)
        outs.append({k: float(v) for k, v in m["losses_g"].items()})
    assert outs[0] == outs[1]


def test_mesh_dp_step_and_overfit(cfg, rng):
    mesh = make_mesh(8)
    state = create_train_state(cfg, seed=0, axis_name="data")
    _, step = make_train_step(cfg, mesh=mesh, donate=False)
    batch = _batch(rng, 8, cfg.model.image_size)
    key = jax.random.PRNGKey(0)

    totals = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        total = sum(float(v) for v in metrics["losses_g"].values())
        assert np.isfinite(total)
        totals.append(total)
        # replicated state: all loss entries are cross-shard identical scalars
        assert metrics["losses_g"]["P"].shape == ()
    # on a FIXED batch the generator objective should trend down
    assert totals[-1] < totals[0], totals

    # aux visuals come back globally sharded
    assert metrics["aux"]["generated_d"].shape == (8, cfg.model.image_size,
                                                   cfg.model.image_size, 3)


def test_fused_aug_step_uint8(cfg, rng):
    """fused_aug: the step takes raw uint8 (s, d) and computes the augmented
    contrastive views on device inside the same XLA program."""
    state = create_train_state(cfg, seed=0)
    _, step = make_train_step(cfg, donate=False, fused_aug=True)
    size = cfg.model.image_size
    batch = tuple(jnp.asarray((rng.rand(2, size, size, 3) * 255).astype(np.uint8))
                  for _ in range(2))
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    for k, v in {**metrics["losses_g"], **metrics["losses_d"]}.items():
        assert np.isfinite(float(v)), f"loss {k} not finite"
    assert int(state2.step) == 1
    # C is a real contrastive loss (augmented views flowed)
    assert float(metrics["losses_g"]["C"]) != 0.0


def test_fused_aug_mesh_step(cfg, rng):
    mesh = make_mesh(8)
    state = create_train_state(cfg, seed=0, axis_name="data")
    _, step = make_train_step(cfg, mesh=mesh, donate=False, fused_aug=True)
    size = cfg.model.image_size
    batch = tuple(jnp.asarray((rng.rand(8, size, size, 3) * 255).astype(np.uint8))
                  for _ in range(2))
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    total = sum(float(v) for v in metrics["losses_g"].values())
    assert np.isfinite(total)
    assert int(state2.step) == 1


def test_train_vae_mode(cfg, rng):
    """train_vae=True: KL becomes data-dependent and noise flows."""
    state = create_train_state(cfg, seed=0)
    _, step = make_train_step(cfg, train_vae=True, donate=False)
    batch = _batch(rng, 2, cfg.model.image_size)
    _, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["losses_g"]["K"]))


def test_scan_matches_single_steps(cfg, rng):
    """The K-steps-per-dispatch scan program (train/scan.py) matches K
    consecutive single-step calls: same RNG stream (fold_in with state.step
    inside the program), same gathers, same losses.  Step 0 must agree to
    float tolerance; later steps only loosely — scan and the standalone jit
    are DIFFERENT XLA programs whose fp32 fusion differences amplify
    chaotically through the soft-argmax keypoints (the PARITY.md fp64 probe
    quantifies this class of drift)."""
    from facevae_tpu.train.scan import make_scan_train_step

    size = cfg.model.image_size
    frames = jnp.asarray((rng.rand(12, size, size, 3) * 255).astype(np.uint8))
    K, B = 3, 2
    s_idx = jnp.asarray(rng.randint(0, 12, (K, B)), jnp.int32)
    d_idx = jnp.asarray(rng.randint(0, 12, (K, B)), jnp.int32)
    key = jax.random.PRNGKey(7)

    # reference stream: K single fused-aug steps with host-side gathers
    state_a = create_train_state(cfg, seed=0)
    _, step = make_train_step(cfg, donate=False, fused_aug=True)
    per_step = []
    for k in range(K):
        batch = (jnp.take(frames, s_idx[k], axis=0),
                 jnp.take(frames, d_idx[k], axis=0))
        state_a, m = step(state_a, batch, jax.random.fold_in(key, k))
        per_step.append(m)

    state_b = create_train_state(cfg, seed=0)
    _, scan_fn = make_scan_train_step(cfg, donate=False)
    state_b, metrics = scan_fn(state_b, frames, s_idx, d_idx, key)

    assert int(state_b.step) == K
    # step 0: same program inputs, float-level agreement proves the RNG
    # stream and gather wiring; steps >=1 bound the chaotic program drift
    for k in range(K):
        rtol = 1e-5 if k == 0 else 5e-2
        for name, v in per_step[k]["losses_g"].items():
            np.testing.assert_allclose(
                float(metrics["losses_g"][name][k]), float(v), rtol=rtol,
                atol=1e-6, err_msg=f"G loss {name} step {k}")
        for name, v in per_step[k]["losses_d"].items():
            np.testing.assert_allclose(
                float(metrics["losses_d"][name][k]), float(v), rtol=rtol,
                atol=1e-6, err_msg=f"D loss {name} step {k}")
    # final params stay within a few Adam steps' worth of drift
    for tree_a, tree_b, label in [
            (state_a.g_params, state_b.g_params, "g_params"),
            (state_a.d_params, state_b.d_params, "d_params")]:
        dev = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           tree_a, tree_b)
        assert max(jax.tree.leaves(dev)) < 5e-4, (label, dev)
    # aux is the LAST step's aux — not the zeros template and not an earlier
    # step's.  (Pointwise equality is too strict: ~1e-4 param drift shifts
    # soft-argmax keypoints, which MOVES warped pixels — so compare which
    # step the carried image is closest to.)
    got = np.asarray(metrics["aux"]["generated_d"])
    assert np.abs(got).max() > 0
    dists = [float(np.abs(got - np.asarray(m["aux"]["generated_d"])).mean())
             for m in per_step]
    assert int(np.argmin(dists)) == K - 1, dists


@pytest.mark.slow
def test_dp_vs_1dev_multistep(cfg, rng):
    """The full multi-chip DP invariance rigor (moved here from the driver's
    __graft_entry__.dryrun_multichip, which is sized for a cold-cache compile
    budget — VERDICT.md round-4 item 1): THREE consecutive steps on an
    8-device mesh must match a 1-device run on the same concatenated batch
    (pmean'd grads / SyncBN stats == global-batch math), exercising BN
    running stats, spectral power-iteration u/v, and Adam moments as they
    evolve; plus ONE train_vae=True DP step (quirk q8's other switch) with
    data-dependent KL and per-shard reparameterization noise.
    Reference contract: DDP + SyncBN every step, logger.py:55-61,135-184."""
    from facevae_tpu.ops.tps import random_transform_params

    n = 8
    mesh8, mesh1 = make_mesh(n), make_mesh(1)
    state8 = create_train_state(cfg, seed=0, axis_name="data")
    state1 = create_train_state(cfg, seed=0, axis_name="data")
    _, step8 = make_train_step(cfg, mesh=mesh8, donate=False)
    _, step1 = make_train_step(cfg, mesh=mesh1, donate=False)
    key = jax.random.PRNGKey(0)
    size = cfg.model.image_size

    def one_step(i, stepfn, st):
        k_step = jax.random.fold_in(key, i)
        batch = tuple(jax.random.uniform(jax.random.fold_in(k_step, 1000 + j),
                                         (n, size, size, 3))
                      for j in range(4))
        tp = random_transform_params(jax.random.fold_in(k_step, 99), n)
        return stepfn(st, batch, k_step, tp)

    for i in range(3):
        state8, m8 = one_step(i, step8, state8)
        state1, m1 = one_step(i, step1, state1)
        l8 = {k: float(v) for k, v in m8["losses_g"].items()}
        l1 = {k: float(v) for k, v in m1["losses_g"].items()}
        assert all(v == v for v in l8.values()), f"non-finite: {l8}"
        # F scales with PER-DEVICE batch (reference double-indexing quirk,
        # losses.py:187-195): rescale before comparing.
        scaled = dict(l8, F=l8["F"] * n)
        loss_dev = max(abs(scaled[k] - l1[k]) / max(1.0, abs(l1[k]))
                       for k in l8)
        pdev = jax.tree.reduce(
            max, jax.tree.map(
                lambda a, b: float(np.max(np.abs(
                    np.asarray(a, np.float32) - np.asarray(b, np.float32)))),
                jax.device_get(state8.g_params), jax.device_get(state1.g_params)))
        # loss bound grows ~8x/step (fp32 reduction-order chaos through the
        # soft-argmax keypoints; measured 9e-4 / 1e-2 / 7e-2 over steps 0-2
        # with remat on); param bound is the real sync invariant (Adam caps
        # each update at ~lr).
        assert loss_dev < 1e-2 * 25.0 ** i, (i, l8, l1)
        assert pdev < 1e-3 * (i + 1), (i, pdev)
    assert int(state8.step) == 3

    # train_vae=True DP step: finite losses, data-dependent KL path runs
    _, step_vae = make_train_step(cfg, mesh=mesh8, train_vae=True, donate=False)
    state_vae, m_vae = one_step(7, step_vae, state8)
    lv = {k: float(v) for k, v in m_vae["losses_g"].items()}
    assert all(v == v for v in lv.values()), f"non-finite (train_vae): {lv}"
    assert int(state_vae.step) == 4


def test_scan_mesh_dp_matches_per_step_mesh(cfg, rng):
    """Sharded scan mode (VERDICT.md round-4 item 4): the shard_map'd
    K-steps-per-dispatch scan over a SHARDED frame cache must match the
    per-step mesh loop on the same index stream — same pmean'd grads, same
    SyncBN stats, same RNG (fold_in with state.step inside, then axis_index
    inside the step body).  Reference analog: DDP + DistributedSampler
    (train.py:15-16, logger.py:55-58)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from facevae_tpu.train.scan import make_scan_train_step

    n, B_local, K = 8, 1, 2
    size = cfg.model.image_size
    mesh = make_mesh(n)
    S = 4                                    # frames per shard
    frames_host = (rng.rand(n * S, size, size, 3) * 255).astype(np.uint8)
    frames = jax.device_put(frames_host, NamedSharding(mesh, P("data")))
    # shard-major shard-LOCAL index tables [K, n*B_local]
    s_idx = rng.randint(0, S, (K, n * B_local)).astype(np.int32)
    d_idx = rng.randint(0, S, (K, n * B_local)).astype(np.int32)
    shard_of = np.arange(n * B_local) // B_local
    flat_s = s_idx + shard_of[None, :] * S   # global positions for host gather
    flat_d = d_idx + shard_of[None, :] * S
    key = jax.random.PRNGKey(11)

    # reference stream: K per-step mesh dispatches on host-gathered batches
    state_a = create_train_state(cfg, seed=0, axis_name="data")
    _, step = make_train_step(cfg, mesh=mesh, donate=False, fused_aug=True)
    per_step = []
    for k in range(K):
        batch = (jnp.asarray(frames_host[flat_s[k]]),
                 jnp.asarray(frames_host[flat_d[k]]))
        state_a, m = step(state_a, batch, jax.random.fold_in(key, k))
        per_step.append(m)

    state_b = create_train_state(cfg, seed=0, axis_name="data")
    _, scan_fn = make_scan_train_step(cfg, donate=False, mesh=mesh)
    state_b, metrics = scan_fn(state_b, frames, jnp.asarray(s_idx),
                               jnp.asarray(d_idx), key)
    assert int(state_b.step) == K
    for k in range(K):
        rtol = 1e-5 if k == 0 else 5e-2
        for name, v in per_step[k]["losses_g"].items():
            np.testing.assert_allclose(
                float(metrics["losses_g"][name][k]), float(v), rtol=rtol,
                atol=1e-6, err_msg=f"G loss {name} step {k}")
    for tree_a, tree_b, label in [
            (state_a.g_params, state_b.g_params, "g_params"),
            (state_a.d_params, state_b.d_params, "d_params")]:
        dev = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           jax.device_get(tree_a), jax.device_get(tree_b))
        assert max(jax.tree.leaves(dev)) < 5e-4, (label, dev)
    # aux comes back globally sharded: the full global batch
    assert metrics["aux"]["generated_d"].shape[0] == n * B_local
