"""Pallas TPU kernels.

warp_mm.py — fused trilinear-warp kernels (the bf16 training hot path,
default dispatch via ops/fast_warp.py): the one-hot interpolation operands
are built in VMEM and fed straight to the MXU, so HBM never sees the
[P, D*H] A matrices that dominate the XLA formulation's traffic.  Forward is
one kernel; backward is split into a dgrid kernel and a rows-free drows
kernel with independent voxel-block sizes.  Full-step A/B on the v5e:
9.69 vs 8.41 frames/s over the XLA one-hot-matmul path (PERF.md).
"""
from facevae_tpu.ops.pallas.warp_mm import (warp_mm_fwd_pallas,
                                            warp_mm_bwd_pallas)
