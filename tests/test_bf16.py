"""bf16 mixed-precision config: step runs, losses finite and close to fp32."""
import numpy as np
import jax
import jax.numpy as jnp

from facevae_tpu.config import tiny_config
from facevae_tpu.train import create_train_state, make_train_step


def test_bf16_step_close_to_fp32(rng):
    batch = tuple(jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32) for _ in range(4))
    key = jax.random.PRNGKey(0)

    outs = {}
    for dtype in ("float32", "bfloat16"):
        cfg = tiny_config(compute_dtype=dtype)
        state = create_train_state(cfg, seed=0)
        _, step = make_train_step(cfg, donate=False)
        state2, metrics = step(state, batch, key)
        outs[dtype] = {k: float(v) for k, v in metrics["losses_g"].items()}
        for k, v in outs[dtype].items():
            assert np.isfinite(v), (dtype, k, v)
        # params move and stay fp32
        leaf = jax.tree.leaves(state2.g_params)[0]
        assert leaf.dtype == jnp.float32

    for k in outs["float32"]:
        a, b = outs["float32"][k], outs["bfloat16"][k]
        # bf16 conv stacks: loose agreement, same order of magnitude
        assert abs(a - b) <= 0.2 * max(abs(a), abs(b), 1.0), (k, a, b)
