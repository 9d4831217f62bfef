"""Pure-function math ops (layer L2).

TPU-native re-implementations of the reference's keypoint/warp math
(/root/reference/utils.py:5-193) plus the interpolation primitives the
reference gets from cuDNN (F.grid_sample, F.interpolate).  All functions are
jit-safe: static shapes, no data-dependent Python control flow, no device
hardcoding (the reference hardcodes .cuda() in ~8 places, quirk q6).
"""
from facevae_tpu.ops.geometry import (
    rotation_matrix_x,
    rotation_matrix_y,
    rotation_matrix_z,
    transform_kp,
    transform_kp_with_new_pose,
    make_coordinate_grid_2d,
    make_coordinate_grid_3d,
)
from facevae_tpu.ops.heatmap import (
    out2heatmap,
    heatmap2kp,
    kp2gaussian_2d,
    kp2gaussian_3d,
)
from facevae_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from facevae_tpu.ops.interpolate import (
    interpolate_bilinear_2d,
    resize_bilinear_half,
    upsample_nearest_2d,
    upsample_nearest_3d,
    avg_pool_2d,
    avg_pool_3d,
    max_pool_2d,
)
from facevae_tpu.ops.motion import (
    create_heatmap_representations,
    create_sparse_motions,
    create_deformed_source_image,
)
from facevae_tpu.ops.normalization import (
    apply_imagenet_normalization,
    apply_vggface_normalization,
)
from facevae_tpu.ops.tps import TransformParams, random_transform_params, warp_coordinates, transform_frame
