"""facevae_tpu — a TPU-native (JAX/XLA/Pallas) face-reenactment training framework.

A from-scratch rebuild of the capabilities of the Luh1124/face-vae reference
(face-vid2vid-style keypoint-driven face animation with a VAE bottleneck and a
contrastive branch inside the expression feature extractor), designed TPU-first:

- All compute paths are jit-compiled XLA programs with static shapes.
- Feature layouts are channel-last (NHWC / NDHWC) so convolutions tile onto the MXU.
- Data parallelism is a 1-axis ``jax.sharding.Mesh`` driven through ``shard_map``;
  gradient and SyncBatchNorm statistics reductions are ``lax.pmean`` over ICI
  (reference: DDP + nn.SyncBatchNorm, /root/reference/logger.py:55-58).
- Hot interpolation ops (2D/3D grid_sample) have Pallas TPU kernels with an
  XLA gather fallback.

Layer map (mirrors reference SURVEY.md §1):
  ops/       L2 pure math: grids, soft-argmax, kp transforms, warps, grid_sample
  nn/        L2 neural blocks: CNA conv blocks, SyncBN, spectral norm, ELR layers
  models/    L3 model zoo: AFE, CKD, HPE_EDE, EFE (+VAE), MFE, Generator, Discriminator
  losses/    L4 loss library: perceptual, GAN, FM, equivariance, kp-prior, headpose,
             deformation, contrastive (SimSiam), KL, recon
  data/      L1 dataset + augmentation (CPU parity path + fused on-device path)
  parallel/  mesh construction, process gating, collective helpers
  train/     L5 runtime: trainer composition, jitted train step, logger, checkpoints
"""

__version__ = "0.1.0"
