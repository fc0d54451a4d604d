from patch_toon_tpu.ops.advect import advect_points, sample_flow_bilinear
from patch_toon_tpu.ops.flow import dense_flow, masked_flow, warp_image
from patch_toon_tpu.ops.masks import (
    box_count_map,
    dilate_valid_centers,
    erode_full_support,
)
from patch_toon_tpu.ops.patches import cut_patches, pad_images_for_gather
from patch_toon_tpu.ops.poisson import golden_ratio_color, poisson_disk_sample
from patch_toon_tpu.ops.resize import resize_bilinear, resize_bilinear_np
from patch_toon_tpu.ops.splat import splat_points

__all__ = [
    "advect_points",
    "sample_flow_bilinear",
    "dense_flow",
    "masked_flow",
    "warp_image",
    "box_count_map",
    "dilate_valid_centers",
    "erode_full_support",
    "cut_patches",
    "pad_images_for_gather",
    "golden_ratio_color",
    "poisson_disk_sample",
    "resize_bilinear",
    "resize_bilinear_np",
    "splat_points",
]
