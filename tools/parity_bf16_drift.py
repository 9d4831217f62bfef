#!/usr/bin/env python
"""bf16-vs-fp32 training drift artifact (VERDICT r3 weak #4).

Same-seed, same-data multi-step training runs in float32 and bfloat16
compute, at the FLAGSHIP 256² config on the TPU; prints a per-"epoch"
loss-curve table (markdown, PARITY.md-ready) and the worst relative
deviation per loss column.

The methodology mirrors the fp64 ground-truth probe (PARITY.md): both runs
see identical batches and identical TPS/VAE noise keys, so every deviation
is dtype-induced (bf16 rounding chaos-amplified through the soft-argmax
keypoints), not data noise.

Usage: python tools/parity_bf16_drift.py [steps_per_epoch=10] [epochs=3]
"""
import sys
import time

sys.path.insert(0, ".")


def run(dtype: str, steps_per_epoch: int, epochs: int, batch: int = 8):
    import jax
    import jax.numpy as jnp
    from facevae_tpu.config import Config, ModelConfig
    from facevae_tpu.train import create_train_state, make_train_step

    cfg = Config(model=ModelConfig(compute_dtype=dtype, remat=False))
    state = create_train_state(cfg, seed=0)
    _, step = make_train_step(cfg, donate=True)
    key = jax.random.PRNGKey(0)

    curves = []
    steps_log = []                      # per-step loss dicts, all epochs
    for e in range(epochs):
        sums = {}
        pending = []
        for i in range(steps_per_epoch):
            k = jax.random.fold_in(key, e * steps_per_epoch + i)
            b = tuple(jax.random.uniform(jax.random.fold_in(k, 100 + j),
                                         (batch, 256, 256, 3))
                      for j in range(4))
            state, metrics = step(state, b, k)
            pending.append(metrics["losses_g"])
        for got in jax.device_get(pending):
            row = {name: float(v) for name, v in got.items()}
            steps_log.append(row)
            for name, v in row.items():
                sums[name] = sums.get(name, 0.0) + v
        curves.append({kk: vv / steps_per_epoch for kk, vv in sums.items()})
    return curves, steps_log


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    t0 = time.time()
    fp32, fp32_steps = run("float32", steps, epochs)
    print(f"# fp32 run done in {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    bf16, bf16_steps = run("bfloat16", steps, epochs)
    print(f"# bf16 run done in {time.time()-t0:.0f}s", file=sys.stderr)

    # Per-step deviation growth: step 0 is pure dtype rounding (both runs
    # start from IDENTICAL fp32 params and see identical batches); later
    # steps accumulate parameter divergence.  The fp64 probe (PARITY.md)
    # showed the keypoint losses sit on a chaotic trajectory — this view
    # separates systematic bf16 bias (step 0) from chaos growth (slope).
    print("\nper-step worst relative loss deviation (max over P G F E L H D C):")
    for i in (0, 1, 2, 3, 5, 8, len(fp32_steps) - 1):
        if i >= len(fp32_steps):
            continue
        a, b = fp32_steps[i], bf16_steps[i]
        dev = max(abs(a[n] - b[n]) / max(1.0, abs(a[n]))
                  for n in ("P", "G", "F", "E", "L", "H", "D", "C"))
        per = "  ".join(
            f"{n}={abs(a[n]-b[n])/max(1.0, abs(a[n])):.3%}"
            for n in ("P", "E", "L", "H"))
        print(f"  step {i:3d}: worst {dev:.3%}   ({per})")

    order = ["P", "G", "F", "E", "L", "H", "D", "C"]
    print(f"\n| epoch | " + " | ".join(f"{n} fp32 | {n} bf16" for n in order) + " |")
    print("|" + "---|" * (1 + 2 * len(order)))
    worst = {}
    for e, (a, b) in enumerate(zip(fp32, bf16)):
        cells = []
        for n in order:
            cells.append(f"{a[n]:.4f} | {b[n]:.4f}")
            rel = abs(a[n] - b[n]) / max(1.0, abs(a[n]))
            worst[n] = max(worst.get(n, 0.0), rel)
        print(f"| {e} | " + " | ".join(cells) + " |")
    print("\nworst relative deviation per column "
          "(|fp32-bf16| / max(1,|fp32|)):")
    print("  " + "  ".join(f"{n}={v:.3%}" for n, v in worst.items()))
    print(f"  overall worst: {max(worst.values()):.3%}")


if __name__ == "__main__":
    main()
