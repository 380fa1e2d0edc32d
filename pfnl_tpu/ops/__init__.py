"""L0 tensor-op library: the compute primitives every model builds on.

All functions are pure, jittable, and operate on channel-last float32 arrays
in [0, 1] ([N,H,W,C] images or [N,T,H,W,C] clips) unless documented
otherwise.  Reference-behaviour citations point into /root/reference.
"""

from pfnl_tpu.ops.degrade import gaussian_kernel_2d, BLUR_KERNEL, downsample, downsample_4d
from pfnl_tpu.ops.color import rgb2y, rgb2ycbcr, ycbcr2rgb, rgb2gray, rgb2ycbcr_np
from pfnl_tpu.ops.resize import resize_bilinear, resize_bicubic, resize_images
from pfnl_tpu.ops.shuffle import (
    depth_to_space,
    space_to_depth,
    depth_to_space_3d,
    pixel_shuffle_legacy,
    zero_upsampling,
)
from pfnl_tpu.ops.warp import backward_warp, forward_warp
from pfnl_tpu.ops.dynfilter import dyn_filter_3d
from pfnl_tpu.ops.losses import charbonnier, huber, total_variation
from pfnl_tpu.ops.nonlocal_attn import nonlocal_attention

__all__ = [
    "gaussian_kernel_2d",
    "BLUR_KERNEL",
    "downsample",
    "downsample_4d",
    "rgb2y",
    "rgb2ycbcr",
    "ycbcr2rgb",
    "rgb2gray",
    "rgb2ycbcr_np",
    "resize_bilinear",
    "resize_bicubic",
    "resize_images",
    "depth_to_space",
    "space_to_depth",
    "depth_to_space_3d",
    "pixel_shuffle_legacy",
    "zero_upsampling",
    "backward_warp",
    "forward_warp",
    "dyn_filter_3d",
    "charbonnier",
    "huber",
    "total_variation",
    "nonlocal_attention",
]
