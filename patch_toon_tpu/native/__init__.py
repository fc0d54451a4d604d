from patch_toon_tpu.native.frameio import (
    FrameLoader,
    FrameWriter,
    decode_png,
    encode_png,
    native_available,
)

__all__ = [
    "FrameLoader",
    "FrameWriter",
    "decode_png",
    "encode_png",
    "native_available",
]
