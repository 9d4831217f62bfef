"""Pallas TPU kernels (reserved).

Round-1 finding (see PERF.md): the hot trilinear warps are fastest as
XLA-level formulations — wide-row gathers + VPU x-interp for fp32, and
gather/scatter-free one-hot matmuls on the MXU for bf16 — because Mosaic
supports lane-axis take_along_axis but not sublane gathers, which the warp
would need for a direct in-VMEM kernel.  The next step if more warp speed is
needed: a Pallas kernel holding one [D*H, C*W] volume (0.5-4MB) in VMEM and
fusing the chunk loop + one-hot matmul + x-reduction, eliminating the
lax.map while-loop overhead (~0.4s/step today).
"""
