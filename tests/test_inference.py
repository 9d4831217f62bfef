"""InferencePipeline: all five evaluate modes produce valid images
(tiny config, fresh state)."""
import numpy as np
import jax
import jax.numpy as jnp

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
