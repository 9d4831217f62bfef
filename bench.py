#!/usr/bin/env python
"""Benchmark: VoxCeleb-256² training throughput, frames/sec/chip.

Runs the FULL training step (generator+discriminator updates, all 10 losses,
SyncBN-free single-chip path) on synthetic 256² batches on the available
accelerator and prints ONE JSON line:
  {"metric": "train_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": R}

vs_baseline compares against the reference stack's published/estimated
throughput; the reference publishes NO numbers (BASELINE.md), so the baseline
anchor is the BASELINE.json north-star target of 2x A100 frames/sec/chip,
using a measured-elsewhere estimate of the torch reference on A100
(~6.5 frames/s/GPU at batch 3x8GPU-equivalent work, see BASELINE.md table:
batch 3/GPU was the real run).  vs_baseline = value / (2 * 6.5).
"""
import json
import time
import sys


A100_REFERENCE_FPS_ESTIMATE = 6.5      # torch reference, frames/s per A100
TARGET_MULTIPLIER = 2.0


def main():
    import jax
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from facevae_tpu.config import Config
    from facevae_tpu.train import create_train_state, make_train_step

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    # remat off by default: 256² batch 8 fits HBM without it and runs ~9%
    # faster (PERF.md); pass "remat" to re-enable for larger batches
    remat = (sys.argv[4] == "remat") if len(sys.argv) > 4 else False

    from facevae_tpu.config import ModelConfig
    cfg = Config(model=ModelConfig(compute_dtype=dtype, remat=remat))
    state = create_train_state(cfg, seed=0)
    _, step = make_train_step(cfg, donate=True)

    key = jax.random.PRNGKey(0)
    batch = tuple(jax.random.uniform(jax.random.fold_in(key, i),
                                     (batch_size, 256, 256, 3))
                  for i in range(4))

    flops = 0.0
    try:
        # XLA-counted step FLOPs (computed before the run — donated buffers
        # are invalid afterwards; lower() needs only shapes).  This INCLUDES
        # the dense-formulation overhead of the banded/s2d convs but NOT the
        # Pallas warp kernels' internal matmuls (custom calls count 0) —
        # see PERF.md roofline for the full executed-FLOP accounting.
        cost = step.lower(state, batch, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except (AttributeError, KeyError, TypeError) as e:
        # e.g. the mesh dispatch path has no .lower, or cost_analysis schema
        # changed — report rather than silently dropping the utilization line
        print(f"# FLOPs counting skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # warmup / compile.  NOTE: block_until_ready is unreliable on this
    # runtime (buffer futures resolve before device execution completes);
    # only a device->host READ is a hard sync.  Verified against
    # jax.profiler device_duration totals.
    state, metrics = step(state, batch, key)
    jax.device_get(jax.tree.leaves(state.g_params)[0])

    t0 = time.time()
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    jax.device_get(jax.tree.leaves(state.g_params)[0])   # hard sync
    dt = time.time() - t0
    assert all(float(v) == float(v) for v in metrics["losses_g"].values()), "NaN loss"

    fps = batch_size * steps / dt
    baseline = TARGET_MULTIPLIER * A100_REFERENCE_FPS_ESTIMATE
    out = {
        "metric": "train_frames_per_sec_per_chip",
        "config": f"256x256 full model, batch {batch_size}, {dtype}",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 3),
        "baseline_is_estimate": True,  # reference publishes no numbers; see BASELINE.md
    }
    if flops > 0:
        # honest efficiency figure alongside the estimated-baseline ratio
        step_dt = dt / steps
        out["xla_tflops_per_step"] = round(flops / 1e12, 2)
        out["xla_flops_utilization_pct_v5e"] = round(
            flops / step_dt / 197e12 * 100, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
