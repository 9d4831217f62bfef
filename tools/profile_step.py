#!/usr/bin/env python
"""Profile the full 256² training step on the attached accelerator.

Writes a jax.profiler trace to --out and prints a per-op-category breakdown
aggregated from the trace's device events, plus the hard-sync step time used
by bench.py.  Usage: python tools/profile_step.py [batch] [dtype] [outdir]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from facevae_tpu.config import Config, ModelConfig
    from facevae_tpu.train import create_train_state, make_train_step

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/facevae_profile"

    cfg = Config(model=ModelConfig(compute_dtype=dtype, remat=False))
    state = create_train_state(cfg, seed=0)
    _, step = make_train_step(cfg, donate=True)

    key = jax.random.PRNGKey(0)
    batch = tuple(jax.random.uniform(jax.random.fold_in(key, i),
                                     (batch_size, 256, 256, 3))
                  for i in range(4))
    state, metrics = step(state, batch, key)
    jax.device_get(jax.tree.leaves(state.g_params)[0])

    t0 = time.time()
    for i in range(4):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    jax.device_get(jax.tree.leaves(state.g_params)[0])
    dt = (time.time() - t0) / 4
    print(f"hard-sync step time: {dt*1000:.1f} ms  ({batch_size/dt:.2f} frames/s)")

    jax.profiler.start_trace(out)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.fold_in(key, 100 + i))
    jax.device_get(jax.tree.leaves(state.g_params)[0])
    jax.profiler.stop_trace()

    # Aggregate device_duration by op category from the trace proto.
    paths = sorted(glob.glob(out + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace json found under", out)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    cat = defaultdict(float)
    per_op = defaultdict(lambda: [0.0, 0, ""])   # name -> [us, count, tf_op]
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        # device events carry 'device_duration_ps' or live on TPU pids; use
        # the event name prefix as category
        dur = ev.get("dur", 0)  # microseconds
        if not dur:
            continue
        if "tid" in ev and isinstance(ev.get("args"), dict) and args.get("device_duration_ps"):
            dur = float(args["device_duration_ps"]) / 1e6  # ps->us
        key_ = name.split(".")[0].split("(")[0]
        cat[key_] += dur
        if args.get("device_duration_ps"):
            rec = per_op[name]
            rec[0] += dur
            rec[1] += 1
            rec[2] = (args.get("tf_op") or args.get("long_name") or "")[:140]
    top = sorted(cat.items(), key=lambda kv: -kv[1])[:40]
    for name, us in top:
        print(f"{us/1e3/2:9.2f} ms  {name}")
    if per_op:
        print("\n# top individual device ops (2 steps; ms is per step)")
        for name, (us, n, tf_op) in sorted(
                per_op.items(), key=lambda kv: -kv[1][0])[:45]:
            print(f"{us/1e3/2:9.2f} ms  x{n:<3d} {name}  [{tf_op}]")


if __name__ == "__main__":
    main()
