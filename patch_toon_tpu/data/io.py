"""Host-side image IO with the reference's exact value semantics.

Pixel mapping matches the reference transform pipeline
(src/data/dataset.py:34-44, src/data/transforms.py:6-17):
RGB -> byte/255 -> Normalize(0.5, 0.5) -> value = byte/255 * 2 - 1.
Masks: grayscale, binarized at >128 (PIL .point), then byte/255 in [0, 1].

Decoding stays on the host (PIL); everything after the decode is a device
graph. Output conversion matches reference generator.py:643-652:
clamp(-1,1) -> (x+1)*127.5 -> round -> uint8.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Union

import numpy as np
from PIL import Image

# Multi-extension resolver order matches reference dataset.py:102 /
# generator.py:289.
_EXTENSIONS = [".png", ".jpg", ".jpeg", ".PNG", ".JPG", ".JPEG"]


def list_images(directory: Union[str, Path]) -> List[str]:
    """Sorted image filenames in a directory (reference dataset.py:47-50)."""
    return sorted(
        f for f in os.listdir(directory)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )


def find_corresponding_image(base_dir: Union[str, Path], image_name: str) -> str:
    """Find a file with the same stem under any supported extension.

    Mirrors reference dataset.py:85-111 / generator.py:274-299 (falls back to
    the joined original path when nothing matches).
    """
    if isinstance(base_dir, dict):
        base_dir = base_dir.get("path")
    base_name = os.path.splitext(os.path.basename(image_name))[0]
    for ext in _EXTENSIONS:
        candidate = os.path.join(str(base_dir), base_name + ext)
        if os.path.exists(candidate):
            return candidate
    return os.path.join(str(base_dir), image_name)


def _decode_rgb_uint8(path: Union[str, Path]) -> np.ndarray:
    """Decode to uint8 HW3 RGB, preferring the native C++ PNG codec.

    Channel handling matches PIL's ``convert("RGB")``: gray replicated,
    LA's L replicated, RGBA's alpha dropped.
    """
    p = str(path)
    if p.lower().endswith(".png"):
        try:
            from patch_toon_tpu.native import decode_png, native_available

            if native_available():
                arr = decode_png(p)
                c = arr.shape[-1]
                if c == 3:
                    return arr
                if c == 1:
                    return np.repeat(arr, 3, axis=-1)
                if c == 2:  # LA
                    return np.repeat(arr[..., :1], 3, axis=-1)
                if c == 4:  # RGBA: PIL convert("RGB") drops alpha
                    return np.ascontiguousarray(arr[..., :3])
        except Exception:
            pass
    return np.asarray(Image.open(p).convert("RGB"))


def load_image_rgb(path: Union[str, Path]) -> np.ndarray:
    """Load an image as float32 HWC RGB in [-1, 1]."""
    arr = _decode_rgb_uint8(path).astype(np.float32) / 255.0
    return arr * 2.0 - 1.0


def load_image_channels(path: Union[str, Path], depth: int) -> np.ndarray:
    """Load a guide-channel image as float32 HWC in [-1, 1], first `depth` bands.

    The reference applies its RGB transform to channel images
    (dataset.py:191, generator.py:606), i.e. forces 3 bands; depth selects how
    many are fed to the network (first `depth` of the RGB conversion).
    """
    arr = _decode_rgb_uint8(path).astype(np.float32) / 255.0
    arr = arr * 2.0 - 1.0
    return arr[..., :depth]


def load_mask(path: Union[str, Path], binarize_threshold: int = 128) -> np.ndarray:
    """Load a mask as float32 HW in [0, 1], binarized at >threshold.

    Mirrors reference dataset.py:157 (``p > 128 and 255``) + ToTensor.
    Native decode used only for single-channel PNGs (PIL's RGB->L luminance
    rounding is kept bit-exact by falling back to PIL otherwise).
    """
    p = str(path)
    if p.lower().endswith(".png"):
        try:
            from patch_toon_tpu.native import decode_png, native_available

            if native_available():
                arr = decode_png(p)
                if arr.shape[-1] in (1, 2):  # L or LA
                    return (arr[..., 0].astype(np.float32)
                            > binarize_threshold).astype(np.float32)
        except Exception:
            pass
    img = Image.open(p).convert("L")
    arr = np.asarray(img, dtype=np.float32)
    return (arr > binarize_threshold).astype(np.float32)


def to_uint8(frame: np.ndarray) -> np.ndarray:
    """[-1,1] float HWC -> uint8, matching reference generator.py:643-652."""
    x = np.clip(np.asarray(frame, dtype=np.float32), -1.0, 1.0)
    x = np.clip((x + 1.0) * 127.5, 0.0, 255.0)
    return np.round(x).astype(np.uint8)


def save_image_uint8(frame: np.ndarray, path: Union[str, Path]) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(frame).save(path)
