from patch_toon_tpu.ops.masks import (
    box_count_map,
    dilate_valid_centers,
    erode_full_support,
)
from patch_toon_tpu.ops.patches import cut_patches, pad_images_for_gather

__all__ = [
    "box_count_map",
    "dilate_valid_centers",
    "erode_full_support",
    "cut_patches",
    "pad_images_for_gather",
]
