"""InferencePipeline: all five evaluate modes produce valid images
(tiny config, fresh state); quantitative metrics mode; PairedDataset pairs
mode."""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facevae_tpu.config import tiny_config
from facevae_tpu.train import create_train_state
from facevae_tpu.train.inference import InferencePipeline


def test_all_inference_modes(rng):
    cfg = tiny_config()
    state = create_train_state(cfg, seed=0)
    pipe = InferencePipeline(cfg, state, use_efe=True)
    size = cfg.model.image_size
    s = jnp.asarray(rng.rand(1, size, size, 3), jnp.float32)
    d = jnp.asarray(rng.rand(1, size, size, 3), jnp.float32)

    def check(img):
        assert img.shape == (1, size, size, 3)
        assert bool(jnp.isfinite(img).all())
        assert bool(((img >= 0) & (img <= 1)).all())

    fs, kp_c, kp_s, Rs = pipe.encode_source(s)
    check(pipe.drive_frame(fs, kp_c, kp_s, Rs, d))           # reconstruction/reenact
    check(pipe.frontalize_frame(d))                          # frontalization
    check(pipe.sample_expression(d, jax.random.PRNGKey(0), jnp.asarray(1.0)))
    check(pipe.interpolate_expression(s, d, jnp.asarray(0.5)))

    # pre-EFE reference path (use_efe=False) also runs
    pipe2 = InferencePipeline(cfg, state, use_efe=False)
    fs, kp_c, kp_s, Rs = pipe2.encode_source(s)
    check(pipe2.drive_frame(fs, kp_c, kp_s, Rs, d))
    check(pipe2.frontalize_frame(d))


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    """Synthetic dataset + a tiny-config checkpoint for the evaluate CLI."""
    from facevae_tpu.train import save_checkpoint
    root = str(tmp_path_factory.mktemp("evaldata"))
    subprocess.run([sys.executable, "tools/make_synthetic_data.py", root,
                    "--num_ids", "3", "--clips_per_id", "2", "--frames", "4",
                    "--size", "64"], check=True)
    ckp_dir = str(tmp_path_factory.mktemp("evalckp"))
    state = create_train_state(tiny_config(), seed=0)
    save_checkpoint(ckp_dir, state, 0)
    return root, ckp_dir


def test_evaluate_metrics_mode(eval_env, tmp_path):
    """--source m: recon L1/MSE/PSNR over the FULL test split (num_videos=0
    default) with batched driving, per-video records + distribution, and a
    JSON artifact file (the north-star recon-L1 measured on a checkpoint)."""
    root, ckp_dir = eval_env
    import json
    import evaluate
    metrics_out = str(tmp_path / "recon_eval.json")
    out = evaluate.main(["--ckp_dir", ckp_dir, "--ckp", "0", "--source", "m",
                         "--driving", root, "--tiny", "true",
                         "--image_size", "64",
                         "--num_frames", "3", "--eval_batch", "2",
                         "--metrics_out", metrics_out])
    assert out["metric"] == "recon_eval"
    # full split, padded-batch driving: every (3-1) frames of every test video
    assert out["frames"] == out["videos"] * 2
    for k in ("recon_l1", "recon_mse", "psnr_db"):
        assert np.isfinite(out[k]), out
    assert 0.0 <= out["recon_l1"] <= 1.0
    assert len(out["per_video"]) == out["videos"]
    for rec in out["per_video"]:
        assert rec["frames"] == 2 and 0.0 <= rec["l1"] <= 1.0
    assert out["l1_dist"]["p10"] <= out["l1_dist"]["p90"]
    # the committed-artifact path round-trips
    disk = json.load(open(metrics_out))
    assert disk["recon_l1"] == out["recon_l1"]
    assert len(disk["per_video"]) == out["videos"]


def test_evaluate_pairs_mode(eval_env, tmp_path):
    """--source p: PairedDataset cross-identity reenactment gif strip."""
    root, ckp_dir = eval_env
    import evaluate
    gif = str(tmp_path / "pairs.gif")
    evaluate.main(["--ckp_dir", ckp_dir, "--ckp", "0", "--source", "p",
                   "--driving", root, "--tiny", "true", "--image_size", "64",
                   "--num_pairs", "2", "--num_frames", "2",
                   "--output", gif])
    assert os.path.exists(gif)
