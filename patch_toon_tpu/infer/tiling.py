"""Tile-grid construction and Gaussian blending weights (host side).

Replicates the reference's tile placement exactly
(generator.py:353-398 ``_get_valid_patch_positions``): walk the row-major
nonzero list of the eroded mask with step = stride over the *list index*,
dedupe by the (y//stride, x//stride) cell, and emit boxes
(max(0,y-s/2), min(H,y+s/2), max(0,x-s/2), min(W,x+s/2)).

The per-tile Gaussian blending window replicates generator.py:527-539: a
separable exp(-((i - n/2)^2 / (n/4)^2)) on the *box* size, bilinearly resized
(half-pixel convention) to the full patch size when the box is clipped at a
frame border (generator.py:532-539).

These run on host numpy (microseconds per frame; data-dependent control flow
that would force recompilation if traced); everything downstream is jitted.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

from patch_toon_tpu.ops.resize import resize_bilinear_np

Box = Tuple[int, int, int, int]  # y_start, y_end, x_start, x_end


def tile_boxes_from_mask(
    eroded_mask: np.ndarray,
    patch_size: int,
    overlap_percent: float = 30.0,
) -> List[Box]:
    overlap = min(max(overlap_percent, 0.0), 100.0) / 100.0
    stride = max(1, int(patch_size * (1.0 - overlap)))
    half = patch_size // 2
    h, w = eroded_mask.shape[-2:]

    ys, xs = np.nonzero(np.asarray(eroded_mask).reshape(h, w))
    boxes: List[Box] = []
    used = set()
    for idx in range(0, len(ys), stride):
        y, x = int(ys[idx]), int(xs[idx])
        key = (y // stride, x // stride)
        if key in used:
            continue
        used.add(key)
        boxes.append((max(0, y - half), min(h, y + half),
                      max(0, x - half), min(w, x + half)))
    return boxes


@functools.lru_cache(maxsize=1024)
def gaussian_tile_weight(box_h: int, box_w: int, patch_size: int) -> np.ndarray:
    """(patch_size, patch_size) float32 blending window for a clipped box."""
    wy = np.exp(-((np.arange(box_h, dtype=np.float32) - box_h / 2) ** 2
                  / (box_h / 4) ** 2))
    wx = np.exp(-((np.arange(box_w, dtype=np.float32) - box_w / 2) ** 2
                  / (box_w / 4) ** 2))
    weight = np.outer(wy, wx).astype(np.float32)
    if weight.shape != (patch_size, patch_size):
        weight = resize_bilinear_np(
            weight, (patch_size, patch_size), align_corners=False
        ).astype(np.float32)
    return weight


def bucket_size(n: int, minimum: int = 32) -> int:
    """Round a tile count up to a compile-bucket size.

    Policy (v5e, measured — docs/perf/bucket_sweep_r3.json + r5
    small_batch_r5.json): the generator's per-tile cost is ~flat
    (103-123 us/tile) at every batch that is a MULTIPLE OF 128
    (128/256/384/512/640/768/1024 all measured), and ~2x pathological at
    every other batch tried (160-448 non-multiples: 190-257 us/tile).
    Round 5 measured the mid-range buckets on the bare bf16 generator:
    B=64 is ABSOLUTELY slower than a full B=128 batch (28.9 vs 14.3 ms,
    452 us/tile — same under stock XLA options, so a compiler tiling
    pathology of the bf16 B=64 program, not scoped-VMEM) and B=96 also
    loses to 128 (17.2 ms). So: powers of two up to 32, then the next
    multiple of 128 — a 33..128-tile batch pads straight to 128 (strictly
    faster than the old 64 bucket in every precision mode), and n > 256
    keeps strictly less padding than pow2 (300 -> 384, 520 -> 640).
    Outputs are bit-identical across buckets (padding rows carry zero
    blend weight; instance norm is per-sample).
    """
    b = minimum
    while b < n and b < 32:
        b *= 2
    if n <= b:
        return b
    return (n + 127) // 128 * 128


def pack_boxes_multi(
    per_frame_boxes: List[List[Box]], patch_size: int, bucket: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Pack several frames' tiles into one batch.

    -> (fboxes (bucket, 5) int32 [frame, y0, y1, x0, x1],
        weights (bucket, ps, ps) f32, n_valid). Padding rows carry zero
    weights AND frame index 0 (they read garbage, contribute nothing).
    """
    total = sum(len(b) for b in per_frame_boxes)
    out_boxes = np.zeros((bucket, 5), dtype=np.int32)
    out_weights = np.zeros((bucket, patch_size, patch_size), dtype=np.float32)
    i = 0
    for f, boxes in enumerate(per_frame_boxes):
        for (y0, y1, x0, x1) in boxes:
            out_boxes[i] = (f, y0, y1, x0, x1)
            out_weights[i] = gaussian_tile_weight(y1 - y0, x1 - x0, patch_size)
            i += 1
    return out_boxes, out_weights, total


def frames_per_dispatch(tiles_per_frame: int, max_frames: int = 4,
                        target: int = 512) -> int:
    """How many frames to co-batch so the tile bucket stays full.

    v5e measurement: the generator's per-tile cost is ~flat at 128-multiple
    batches >=128, so padding waste dominates; 3 frames x 170 tiles ->
    bucket 512 at <1% padding beats 1 frame -> bucket 256 at 34% padding
    (and beats fpd=2 -> 340/384: 116 vs 110 us per REAL tile).
    """
    if tiles_per_frame <= 0:
        return 1
    return int(max(1, min(max_frames, target // max(1, tiles_per_frame))))


def pack_boxes(
    boxes: List[Box], patch_size: int, bucket: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """-> (boxes (bucket,4) int32, weights (bucket,ps,ps) f32, n_valid).

    Padding entries carry zero weights so they contribute nothing to the
    blended canvas.
    """
    n = len(boxes)
    out_boxes = np.zeros((bucket, 4), dtype=np.int32)
    out_weights = np.zeros((bucket, patch_size, patch_size), dtype=np.float32)
    for i, (y0, y1, x0, x1) in enumerate(boxes):
        out_boxes[i] = (y0, y1, x0, x1)
        out_weights[i] = gaussian_tile_weight(y1 - y0, x1 - x0, patch_size)
    return out_boxes, out_weights, n
