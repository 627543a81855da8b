"""TPU-native ops: sampling, geometry, resizing, and Pallas kernels."""

from supervised_dispnet_tpu.ops.sampling import (
    bilinear_sample,
    grid_sample,
)
from supervised_dispnet_tpu.ops.warp import (
    euler2mat,
    quat2mat,
    pose_vec2mat,
    pixel2cam,
    cam2pixel,
    inverse_warp,
)
from supervised_dispnet_tpu.ops.resize import (
    resize_bilinear,
    resize_like,
    downsample2x_avg,
    scale_pyramid,
)

__all__ = [
    "bilinear_sample",
    "grid_sample",
    "euler2mat",
    "quat2mat",
    "pose_vec2mat",
    "pixel2cam",
    "cam2pixel",
    "inverse_warp",
    "resize_bilinear",
    "resize_like",
    "downsample2x_avg",
    "scale_pyramid",
]
