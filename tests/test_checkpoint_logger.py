"""Checkpoint round-trip, text-log format (add.txt parity incl. quirk q4),
and visualizer output."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from facevae_tpu.config import tiny_config
from facevae_tpu.train import create_train_state, save_checkpoint, load_checkpoint, checkpoint_path
from facevae_tpu.train.logger import ScalarLog, Visualizer, save_visualization


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    state = create_train_state(cfg, seed=0)
    state = state.replace(step=jnp.asarray(7, jnp.int32),
                          epoch=jnp.asarray(3, jnp.int32))
    path = save_checkpoint(str(tmp_path), state, 3)
    assert path.endswith("00000003-checkpoint.msgpack")

    template = create_train_state(cfg, seed=1)       # different init
    restored = load_checkpoint(str(tmp_path), 3, template)
    assert int(restored.step) == 7 and int(restored.epoch) == 3
    for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.g_opt), jax.tree.leaves(restored.g_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_retention_and_latest(tmp_path):
    """Retention policy (--keep_checkpoints): only the N newest epoch files
    survive, latest_checkpoint_epoch finds the resume target, and the
    retained latest restores (the reference keeps every ~GB epoch file
    forever, logger.py:93-102)."""
    from facevae_tpu.train.checkpoint import (
        latest_checkpoint_epoch, list_checkpoints, prune_checkpoints)

    cfg = tiny_config()
    ckp_dir = str(tmp_path)
    assert latest_checkpoint_epoch(ckp_dir) is None
    state = create_train_state(cfg, seed=0)
    for epoch in range(5):
        st = state.replace(step=jnp.asarray(epoch * 10, jnp.int32),
                           epoch=jnp.asarray(epoch, jnp.int32))
        save_checkpoint(ckp_dir, st, epoch, keep=3)
    assert [e for e, _ in list_checkpoints(ckp_dir)] == [2, 3, 4]
    assert latest_checkpoint_epoch(ckp_dir) == 4

    # resume-from-latest restores the newest retained epoch
    template = create_train_state(cfg, seed=1)
    restored = load_checkpoint(ckp_dir, latest_checkpoint_epoch(ckp_dir), template)
    assert int(restored.epoch) == 4 and int(restored.step) == 40

    # keep=0 never prunes; explicit prune respects keep
    save_checkpoint(ckp_dir, state.replace(epoch=jnp.asarray(5, jnp.int32)), 5)
    assert len(list_checkpoints(ckp_dir)) == 4
    prune_checkpoints(ckp_dir, keep=1)
    assert [e for e, _ in list_checkpoints(ckp_dir)] == [5]


def test_crash_save_on_any_exception(rng, tmp_path, monkeypatch):
    """Quirk q5 full parity (reference logger.py:67-68 saves on GC whatever
    killed the loop): a non-KeyboardInterrupt failure mid-epoch must still
    write a checkpoint of the last good state, and that checkpoint must
    resume."""
    import dataclasses
    import pytest
    from facevae_tpu.train import loop as loop_mod

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckp_dir=str(tmp_path / "ckp"), vis_dir=str(tmp_path / "vis"),
        log_file=str(tmp_path / "log.txt"), num_epochs=1))
    state = create_train_state(cfg, seed=0)

    real_make = loop_mod.make_train_step
    calls = {"n": 0}

    def make_failing(cfg, mesh=None, **kw):
        models, step = real_make(cfg, mesh=mesh, **kw)

        def failing_step(state, batch, rng):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("injected mid-epoch failure")
            return step(state, batch, rng)

        return models, failing_step

    monkeypatch.setattr(loop_mod, "make_train_step", make_failing)

    size = cfg.model.image_size
    batches = [tuple(rng.rand(2, size, size, 3).astype(np.float32)
                     for _ in range(4)) for _ in range(3)]

    class Loader:
        def set_epoch(self, epoch):
            pass

        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

    with pytest.raises(RuntimeError, match="injected"):
        loop_mod.train_loop(cfg, state, Loader())

    # the last good state (after step 1, epoch counter still 0) was saved
    assert os.path.exists(checkpoint_path(cfg.train.ckp_dir, 0))
    template = create_train_state(cfg, seed=1)
    restored = load_checkpoint(cfg.train.ckp_dir, 0, template)
    assert int(restored.step) == 1


def test_scalar_log_format_and_quirk_q4(tmp_path):
    log_path = str(tmp_path / "log.txt")
    log = ScalarLog(log_path)
    # two iters; K (column -2) is zero on one of them
    log.log_iter({"P": 1.0, "G": 2.0, "K": 0.0, "R": 0.5},
                 {"G1": 0.1, "G2": 0.2})
    log.log_iter({"P": 3.0, "G": 4.0, "K": 6.0, "R": 0.5},
                 {"G1": 0.3, "G2": 0.4})
    log.log_epoch(0)
    # K never fires -> nan epoch
    log.log_iter({"P": 1.0, "G": 2.0, "K": 0.0, "R": 0.5}, {"G1": 0.1, "G2": 0.2})
    log.log_epoch(1)
    log.close()

    lines = open(log_path).read().splitlines()
    assert lines[0].startswith("G00000000) ")
    assert lines[1].startswith("D00000000) ")
    # q4: K averaged over nonzero entries only -> 6.0, not 3.0
    assert "K - 6.00000" in lines[0]
    assert "P - 2.00000" in lines[0]
    assert "G1 - 0.20000" in lines[1]
    assert "K - nan" in lines[2]


def test_scalar_log_reference_column_order(tmp_path):
    """Metrics dicts arrive ALPHABETIZED from the jit pytree round-trip; the
    log must still carry add.txt's column order (P G F E L H D C K R) so
    curve diffs line up and quirk q4's column -2 is K."""
    log_path = str(tmp_path / "log.txt")
    log = ScalarLog(log_path)
    g = {k: float(i) for i, k in enumerate(sorted("PGFELHDCKR"))}
    g["K"] = 0.0
    log.log_iter(g, {"G1": 0.1, "G2": 0.2})
    log.log_epoch(0)
    log.close()
    line = open(log_path).read().splitlines()[0]
    keys = [seg.split(" - ")[0] for seg in line.split(") ", 1)[1].split("; ")]
    assert keys == ["P", "G", "F", "E", "L", "H", "D", "C", "K", "R"]
    assert "K - nan" in line                   # q4 anchored to the K column


def test_visualizer_grid(rng, tmp_path):
    N, H, K, D, K1 = 2, 16, 3, 4, 4
    vis = Visualizer(kp_size=2)
    img = vis.visualize(
        s=rng.rand(N, H, H, 3).astype(np.float32),
        d=rng.rand(N, H, H, 3).astype(np.float32),
        generated_d=rng.rand(N, H, H, 3).astype(np.float32),
        transformed_d=rng.rand(N, H, H, 3).astype(np.float32),
        kp_s=rng.rand(N, K, 3).astype(np.float32) * 2 - 1,
        kp_d=rng.rand(N, K, 3).astype(np.float32) * 2 - 1,
        transformed_kp=rng.rand(N, K, 3).astype(np.float32) * 2 - 1,
        occlusion=rng.rand(N, H // 4, H // 4, 1).astype(np.float32),
        mask=rng.rand(N, D, H // 4, H // 4, K1).astype(np.float32))
    # 5 image columns + K1 mask columns, N rows
    assert img.shape == (N * H, (5 + K1) * H, 3)
    assert img.dtype == np.uint8
    p = save_visualization(str(tmp_path), 0, img)
    assert os.path.exists(p)
