"""Image transform callables (API parity with reference src/data/transforms.py).

The reference composes PIL-mode coercers with ToTensor + Normalize(0.5, 0.5)
(dataset.py:34-44, generator.py:91-101). This build's pipelines go through
data.io directly, but the same callables are provided for users porting
custom code; they accept PIL images or uint8 arrays and return float arrays.
"""

from __future__ import annotations

from typing import Union

import numpy as np
from PIL import Image


class RGBConvert:
    """Coerce to RGB (reference transforms.py:6-11)."""

    def __call__(self, img: Union[Image.Image, np.ndarray]):
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        return img.convert("RGB")


class GrayscaleConvert:
    """Coerce to single-channel grayscale (reference transforms.py:13-17)."""

    def __call__(self, img: Union[Image.Image, np.ndarray]):
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        return img.convert("L")


class ToTensor:
    """PIL -> float32 HWC array in [0, 1] (channel-last, TPU layout)."""

    def __call__(self, img: Union[Image.Image, np.ndarray]) -> np.ndarray:
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return arr if arr.ndim == 3 else arr[..., None]


class Normalize:
    """(x - mean) / std, channel-last."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, arr: np.ndarray) -> np.ndarray:
        return (arr - self.mean) / self.std


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x
