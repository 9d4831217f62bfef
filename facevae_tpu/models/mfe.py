"""MFE — motion field estimator (reference models.py:1040-1082).

Compresses the appearance volume 32->4 channels, builds (K+1) heatmap diffs +
(K+1) sparse motions + (K+1) warped sources, runs a 3D U-net hourglass over
the concatenation, and emits:
  deformation [N,D,H,W,3] = sum_k mask_k * sparse_motion_k
  occlusion   [N,H,W,1]   = sigmoid(2D conv over the depth-flattened features)
  mask        [N,D,H,W,K+1]

Input channel layout is k-major ([heat_k, deformed_k(4ch)] per keypoint),
matching torch's cat(dim=2).view(N,-1,D,H,W) so checkpoints port exactly.
This is the FLOPs hog of the whole model; the (K+1)-way warp is batched into
one grid_sample_3d call (see ops/motion.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from facevae_tpu.nn import Conv, DownBlock3D, UpBlock3D, fold_depth
from facevae_tpu.ops.fast_warp import warp_multi_pixel
from facevae_tpu.ops.motion import (
    create_heatmap_representations_cl, motion_affine_params,
    sparse_motion_pixel_coords, blend_deformation,
)


class MFE(nn.Module):
    down_seq: Sequence[int] = (80, 64, 128, 256, 512, 1024)
    up_seq: Sequence[int] = (1024, 512, 256, 128, 64, 32)
    K: int = 15
    D: int = 16
    C1: int = 32
    C2: int = 4
    use_weight_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, fs, kp_s, kp_d, Rs, Rd, train: bool = True):
        ax = self.axis_name
        N, D, H, W, _ = fs.shape
        K1 = self.K + 1
        fs_compressed = Conv(self.C2, 1, 1, 0, dim=3, name="compress")(fs, train)

        heatmap = create_heatmap_representations_cl(fs_compressed, kp_s, kp_d)  # [N,D,H,W,K+1]
        # analytic motion: never materializes [N,K+1,D,H,W,3] (tile-hostile
        # trailing dim of 3); the warp reads per-axis pixel coordinate planes.
        # k=0 is the identity warp = an exact copy of the source -> skipped
        # in the kernel and concatenated directly (1/(K+1) less warp work)
        jac, b = motion_affine_params(kp_s, kp_d, Rs, Rd)
        cgx, cgy, cgz = sparse_motion_pixel_coords((D, H, W), jac, b,
                                                   include_identity=False)
        deformed_rest = warp_multi_pixel(fs_compressed, cgx, cgy, cgz,
                                         (D, H, W))               # [N,D,H,W,K*C2]
        deformed = jnp.concatenate(
            [fs_compressed.astype(deformed_rest.dtype), deformed_rest],
            axis=-1)                                              # [N,D,H,W,(K+1)*C2]

        # k-major channel packing [heat_k, deformed_k...]: both operands are
        # already voxel-major, so the interleave is a pure lane shuffle (the
        # old [N,K+1,D,H,W,*] layouts cost ~170ms/step in transposes)
        per_k = jnp.concatenate([heatmap[..., None].astype(deformed.dtype),
                                 deformed.reshape(N, D, H, W, K1, self.C2)],
                                axis=-1)                          # [N,D,H,W,K+1,1+C2]
        inp = per_k.reshape(N, D, H, W, K1 * (1 + self.C2))

        x = inp
        for i in range(len(self.down_seq) - 1):
            x = DownBlock3D(self.down_seq[i], self.down_seq[i + 1],
                            self.use_weight_norm, axis_name=ax)(x, train)
        for i in range(len(self.up_seq) - 1):
            x = UpBlock3D(self.up_seq[i], self.up_seq[i + 1],
                          self.use_weight_norm, axis_name=ax)(x, train)
        x = jnp.concatenate([inp, x], axis=-1)                   # [N,D,H,W,80+32]

        # ONE shared depth fold (d-major, nn.fold_depth) feeds both folded
        # consumers below — the 112-channel volume is transposed once per
        # step (fwd + bwd) instead of once per consumer.
        x2 = fold_depth(x)                                       # [N,H,W,D*C]
        # 7³ conv 112->K+1: z-banded depth-folded execution (exact math, same
        # params; the direct lowering ran at ~3% MXU — nn/layers.py)
        mask = Conv(K1, 7, 1, 3, dim=3, z_banded=True, depth_folded=D,
                    name="mask_conv")(x2, train)
        # softmax + blended coordinates in fp32 (warp precision); the blend
        # reduces to mask-weighted keypoint tables (ops/motion.py)
        mask = nn.softmax(mask.astype(jnp.float32), axis=-1)     # [N,D,H,W,K+1]
        deformation = blend_deformation(mask, jac, b)

        # torch view(N, C*D, H, W) = c-major channels; the folded tensor is
        # d-major, so the (tiny) occlusion kernel is permuted at apply time
        # instead of re-transposing the activation (Conv.depth_folded).
        occlusion = Conv(1, 7, 1, 3, dim=2, depth_folded=D,
                         name="occlusion_conv")(x2, train)
        occlusion = nn.sigmoid(occlusion)                        # [N,H,W,1]
        return deformation, occlusion, mask
