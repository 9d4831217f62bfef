#!/usr/bin/env python
"""Benchmark the device-cache SCAN train path (the end-to-end step).

This is what `train.py --device_cache true --steps_per_dispatch K` runs per
dispatch: uint8 HBM gather + on-device augmentation + the full G+D step,
K steps per XLA program (train/scan.py).  bench.py measures the step fed
with PRE-AUGMENTED float batches; the delta between the two is the true
cost of the data path (gather + dequant + fused aug + scan carry).

Usage: python tools/bench_scan.py [batch] [K] [chunks] [num_frames] [dtype]
Prints one JSON line {"metric": "scan_frames_per_sec_per_chip", ...}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    num_frames = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
    dtype = sys.argv[5] if len(sys.argv) > 5 else "bfloat16"

    from facevae_tpu.config import Config, ModelConfig
    from facevae_tpu.train import create_train_state
    from facevae_tpu.train.scan import make_scan_train_step

    cfg = Config(model=ModelConfig(compute_dtype=dtype, remat=False))
    state = create_train_state(cfg, seed=0)
    _, scan_step = make_scan_train_step(cfg, donate=True)

    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 256, size=(num_frames, 256, 256, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(0)

    def idx():
        return (rng.randint(0, num_frames, size=(K, batch)).astype(np.int32),
                rng.randint(0, num_frames, size=(K, batch)).astype(np.int32))

    s, d = idx()
    state, metrics = scan_step(state, frames, s, d, key)
    jax.device_get(metrics["losses_g"]["P"][-1])          # hard sync

    t0 = time.time()
    for _ in range(chunks):
        s, d = idx()
        state, metrics = scan_step(state, frames, s, d, key)
    jax.device_get(metrics["losses_g"]["P"][-1])          # hard sync
    dt = time.time() - t0

    fps = batch * K * chunks / dt
    print(json.dumps({
        "metric": "scan_frames_per_sec_per_chip",
        "config": f"256x256 full model + gather + fused aug, batch {batch}, "
                  f"K={K}, {dtype}",
        "value": round(fps, 3),
        "unit": "frames/s",
        "ms_per_step": round(dt / (K * chunks) * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
