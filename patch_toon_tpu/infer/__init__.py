from patch_toon_tpu.infer.engine import StyleTransferInference
from patch_toon_tpu.infer.tiling import (
    bucket_size,
    gaussian_tile_weight,
    tile_boxes_from_mask,
)

__all__ = [
    "StyleTransferInference",
    "tile_boxes_from_mask",
    "gaussian_tile_weight",
    "bucket_size",
]
