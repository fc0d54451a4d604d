"""Bilinear resize as small matmuls (MXU-friendly) + numpy twin.

Two coordinate conventions, both needed for reference parity:
- align_corners=True: generator upsampling (src/models/generator.py:13);
- align_corners=False (half-pixel): the inference engine's Gaussian-weight
  resizing (reference generator.py:533-539 uses F.interpolate defaults).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out,in) interpolation matrix for 1D bilinear resampling."""
    a = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        a[:, 0] = 1.0
        return a
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = min(int(np.floor(src)), in_size - 2)
        w = src - lo
        a[i, lo] = 1.0 - w
        a[i, lo + 1] = w
    return a


def resize_bilinear_np(img: np.ndarray, out_hw: Tuple[int, int],
                       align_corners: bool = False) -> np.ndarray:
    """HW or HWC numpy bilinear resize matching torch F.interpolate."""
    h, w = img.shape[:2]
    ah = bilinear_matrix(h, out_hw[0], align_corners)
    aw = bilinear_matrix(w, out_hw[1], align_corners)
    out = np.tensordot(ah, img, axes=(1, 0))          # (H', W[, C])
    out = np.tensordot(aw, out, axes=(1, 1))           # (W', H'[, C])
    return np.swapaxes(out, 0, 1)


def resize_bilinear(img: jax.Array, out_hw: Tuple[int, int],
                    align_corners: bool = False) -> jax.Array:
    """NHWC jax bilinear resize via two matmuls."""
    n, h, w, c = img.shape
    ah = jnp.asarray(bilinear_matrix(h, out_hw[0], align_corners), img.dtype)
    aw = jnp.asarray(bilinear_matrix(w, out_hw[1], align_corners), img.dtype)
    precision = jax.lax.Precision.HIGHEST if img.dtype == jnp.float32 else None
    y = jnp.einsum("oh,nhwc->nowc", ah, img, precision=precision)
    return jnp.einsum("pw,nowc->nopc", aw, y, precision=precision)
