#!/usr/bin/env python
"""Microbench: Mosaic lane-axis dynamic gather throughput.

Gate experiment for the gather-formulation warp kernel (PERF.md round-3
roofline): per voxel the warp needs 4 (z,y)-corner lanes of a
[C*W, D*H]-lanes-resident row matrix.  The one-hot matmul formulation pays
DH-wide dense FLOPs instead; a lane gather at >=200 GB/s effective would
cut the warp bucket ~2x.  This times data[:, idx] (same index vector per
sublane row) inside a Pallas kernel at the MFE shape.

Usage: python tools/microbench_lane_gather.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    CW, DH, VB, NB = 256, 1024, 512, 128   # MFE-ish: gather [CW,VB] per block

    def kernel(data_ref, idx_ref, out_ref):
        idx = idx_ref[0, 0]                                # [VB] int32
        data = data_ref[...]                               # [CW, DH]
        gathered = jnp.take_along_axis(
            data, jnp.broadcast_to(idx[None, :], (CW, VB)), axis=1)
        out_ref[0] = gathered.astype(out_ref.dtype)

    def run(data, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NB, CW, VB), jnp.bfloat16),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((CW, DH), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, VB), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CW, VB), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(data, idx)

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.rand(CW, DH), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, DH, (NB, 1, VB)), jnp.int32)

    ITERS = 20

    def chain(data, idx):
        def body(c, _):
            y = run(data * (1.0 + c * 0), idx)
            return c + jnp.float32(1e-6) * jnp.mean(y.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0), None, length=ITERS)[0]

    g = jax.jit(chain)
    try:
        r = g(data, idx)
        jax.device_get(r)
    except Exception as e:
        print(f"lane gather UNSUPPORTED or failed to lower: "
              f"{type(e).__name__}: {str(e)[:300]}")
        return
    t0 = time.time()
    r = g(data, idx)
    jax.device_get(r)
    dt = (time.time() - t0) / ITERS
    elems = NB * CW * VB
    print(f"lane gather [CW={CW}, DH={DH}] x {NB} blocks of VB={VB}: "
          f"{dt*1e3:.3f} ms/iter  "
          f"{elems * 2 / dt / 1e9:.1f} GB/s effective "
          f"({elems / dt / 1e9:.2f} Gelem/s)")
    # sanity vs host gather
    want = np.take_along_axis(np.asarray(data, np.float32),
                              np.broadcast_to(np.asarray(idx[0, 0])[None, :],
                                              (CW, VB)), axis=1)
    got = np.asarray(run(data, idx))[0].astype(np.float32)
    print("max err vs host gather:", float(np.abs(want - got).max()))


if __name__ == "__main__":
    main()
