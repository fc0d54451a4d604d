"""Batched on-device patch gather.

This replaces the reference's host DataLoader + per-item crop
(dataset.py:209-232 ``_cut_patch`` running in 5 worker processes) with a
single vmapped ``dynamic_slice`` over device-resident keyframes: the whole
keyframe set lives in HBM and a training batch of patches is gathered in one
fused XLA op — no host round-trip in the hot loop.

Crop semantics replicate ``_cut_patch`` exactly, including its quirks:
- crop is ``tensor[:, max(0,y-s/2) : min(y+s/2, H-1), ...]`` — note the
  ``H-1`` bound, so even bottom-interior patches exclude the last row/col;
- short crops are zero-padded anchored top-left (dataset.py:224-231).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp


def pad_images_for_gather(images: jax.Array, patch_size: int) -> jax.Array:
    """Zero-pad the bottom/right of an (N,H,W,C) stack by patch_size.

    Guarantees every dynamic_slice of ``patch_size`` starting inside the
    original image bounds is in-range, so XLA never clamps the start index
    (clamping would silently shift the crop).
    """
    return jnp.pad(
        images,
        ((0, 0), (0, patch_size), (0, patch_size), (0, 0)),
    )


def _cut_one(
    padded: jax.Array,     # (N, H+ps, W+ps, C)
    sizes: jax.Array,      # (N, 2) int32: true (H, W) per image
    img_idx: jax.Array,    # () int32
    center: jax.Array,     # (2,) int32 (y, x)
    patch_size: int,
) -> jax.Array:
    half = patch_size // 2
    y, x = center[0], center[1]
    h = sizes[img_idx, 0]
    w = sizes[img_idx, 1]
    hn = jnp.maximum(0, y - half)
    xn = jnp.maximum(0, x - half)
    # end bound is min(y+half, H-1): reference dataset.py:216-219
    hx = jnp.minimum(y + half, h - 1)
    xx = jnp.minimum(x + half, w - 1)
    c = padded.shape[-1]
    patch = jax.lax.dynamic_slice(
        padded,
        (img_idx, hn, xn, jnp.int32(0)),
        (1, patch_size, patch_size, c),
    )[0]
    rows = jnp.arange(patch_size, dtype=jnp.int32) < (hx - hn)
    cols = jnp.arange(patch_size, dtype=jnp.int32) < (xx - xn)
    return patch * rows[:, None, None] * cols[None, :, None]


@functools.partial(jax.jit, static_argnames=("patch_size",))
def cut_patches(
    padded: jax.Array,
    sizes: jax.Array,
    img_idx: jax.Array,    # (B,)
    centers: jax.Array,    # (B, 2)
    patch_size: int,
) -> jax.Array:
    """Gather a batch of aligned patches: returns (B, ps, ps, C)."""
    return jax.vmap(
        lambda i, ctr: _cut_one(padded, sizes, i, ctr, patch_size)
    )(img_idx, centers)
