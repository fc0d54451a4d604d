from patch_toon_tpu.data.dataset import StyleTransferDataset
from patch_toon_tpu.data.io import (
    find_corresponding_image,
    list_images,
    load_image_rgb,
    load_image_channels,
    load_mask,
    save_image_uint8,
    to_uint8,
)

__all__ = [
    "StyleTransferDataset",
    "find_corresponding_image",
    "list_images",
    "load_image_rgb",
    "load_image_channels",
    "load_mask",
    "save_image_uint8",
    "to_uint8",
]
