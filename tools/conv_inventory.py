"""Enumerate every convolution in the flagship train step with shapes + FLOPs.

Traces the jitted G+D train step on CPU (abstract eval only — no TPU needed)
and walks the StableHLO for convolution ops, attributing each to a dense-FLOP
count and a lane-utilization class (Cin/Cout mod 128 padding on the MXU).

Usage:  JAX_PLATFORMS=cpu python tools/conv_inventory.py [batch] [image_size]

Output: a table sorted by FLOPs, plus bucket totals (packed vs lane-padded),
used to target round-4 conv work (VERDICT round-3 item 2: the ~180 ms
conv_general_dilated bucket at ~45% MXU).
"""
import os
import sys
import re
from collections import defaultdict

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from facevae_tpu.config import Config, ModelConfig
    from facevae_tpu.train.step import make_train_step
    from facevae_tpu.train.state import create_train_state

    cfg = Config(model=ModelConfig(compute_dtype="bfloat16", remat=False))

    models, step = make_train_step(cfg, donate=False, fused_aug=True)
    key = jax.random.PRNGKey(0)
    state = create_train_state(cfg, seed=0)
    s = np.zeros((batch, size, size, 3), np.uint8)
    d = np.zeros((batch, size, size, 3), np.uint8)
    lowered = jax.jit(step).lower(state, (s, d), key)
    hlo = lowered.as_text()

    # StableHLO convolution: %N = stablehlo.convolution(...) {...} :
    #   (tensor<AxBx..xf32>, tensor<..>) -> tensor<..>
    pat = re.compile(
        r"stablehlo\.convolution.*?"
        r"dim_numbers = \[([^\]]*)\]x\[([^\]]*)\]->\[([^\]]*)\].*?"
        r":\s*\(tensor<([^>]*)>,\s*tensor<([^>]*)>\)\s*->\s*tensor<([^>]*)>",
        re.S)

    def dims(t):
        parts = t.split("x")
        return [int(p) for p in parts[:-1]], parts[-1]

    rows = []
    for m in pat.finditer(hlo):
        lhs_spec, rhs_spec, out_spec = (x.strip() for x in m.groups()[:3])
        lhs, lt = dims(m.group(4))
        rhs, rt = dims(m.group(5))
        out, ot = dims(m.group(6))
        # rhs spec like "0, 1, 2, i, o" (spatial..., i, o); find i index
        rspec = [x.strip() for x in rhs_spec.split(",")]
        ospec = [x.strip() for x in out_spec.split(",")]
        ci = rhs[rspec.index("i")]
        co = rhs[rspec.index("o")]
        spatial_k = [rhs[i] for i, sname in enumerate(rspec)
                     if sname not in ("i", "o")]
        out_spatial = [out[i] for i, sname in enumerate(ospec)
                       if sname not in ("b", "f")]
        n = out[ospec.index("b")]
        f = out[ospec.index("f")]
        flops = 2.0 * n * f * ci * np.prod(spatial_k, dtype=np.float64) \
            * np.prod(out_spatial, dtype=np.float64)
        # feature-group conv: ci here is per-group; fine for flops since
        # rhs i is already per-group and f spans all groups
        lane_eff_in = ci / (128 * np.ceil(ci / 128))
        lane_eff_out = co / (128 * np.ceil(co / 128))
        rows.append(dict(ci=ci, co=co, k=tuple(spatial_k), n=n,
                         out_sp=tuple(out_spatial), dt=ot,
                         flops=flops, lane=min(lane_eff_in, lane_eff_out)))

    rows.sort(key=lambda r: -r["flops"])
    total = sum(r["flops"] for r in rows)
    agg = defaultdict(lambda: [0, 0.0])
    print(f"{len(rows)} convolutions, {total/1e12:.2f} dense TFLOP total "
          f"(batch {batch}, {size}^2)")
    print(f"{'flops(G)':>9} {'%':>5} {'Cin':>4} {'Cout':>4} {'k':>10} "
          f"{'out_spatial':>16} {'dt':>5} {'lane_eff':>8}")
    for r in rows[:48]:
        print(f"{r['flops']/1e9:9.1f} {100*r['flops']/total:5.1f} "
              f"{r['ci']:4d} {r['co']:4d} {str(r['k']):>10} "
              f"{str(r['out_sp']):>16} {r['dt']:>5} {r['lane']:8.2f}")
    for r in rows:
        key_ = ("lane<1.0" if r["lane"] < 0.99 else "lane=1.0",
                r["dt"])
        agg[key_][0] += 1
        agg[key_][1] += r["flops"]
    print("\nbuckets:")
    for k, (cnt, fl) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {k}: {cnt} convs, {fl/1e12:.3f} TFLOP ({100*fl/total:.1f}%)")


if __name__ == "__main__":
    main()
