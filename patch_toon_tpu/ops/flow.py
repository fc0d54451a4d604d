"""TPU-native dense optical flow (pyramidal iterative Lucas–Kanade).

Replaces the reference's cv2 C++ DIS optical flow
(tools/optical_flow.py:39,96) with an on-device operator: a Gaussian-ish
image pyramid, and at each level iterative windowed Lucas–Kanade refinement
with backward warping — all convolutions and elementwise math, fully jittable
and batchable over frame pairs.

Exact parity with cv2's DIS output is infeasible (SURVEY.md §7); the parity
bar for guide channels is usefulness, and the optical-flow tool keeps a cv2
DIS backend as the bit-exact escape hatch when opencv is present.

Flow convention matches cv2: ``flow[y, x] = (dx, dy)`` such that
``img2[y + dy, x + dx] ≈ img1[y, x]``.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp


def _box_filter(x: jax.Array, k: int) -> jax.Array:
    """Separable ones-filter over HW (same padding), channels preserved.

    Formulated as a fused shift-add stencil, not a conv: LK's window sums
    ride 5 channels, and a 5-channel grouped TPU conv uses 5 of the VPU's
    128 lanes — measured ~22 GB/s effective (41% of dense_flow,
    docs/perf/lk_parts_r4.json). A k-tap sum of shifted slices fuses into
    ONE elementwise kernel with full lane utilization (the minor axis
    stays W). Summation order is ascending-offset, deterministic; it can
    differ from the conv's internal accumulation order by fp32 roundoff —
    flow values are identical between the tool and the engine (same code)
    either way, and LK's own estimator error dwarfs 1-ulp window sums
    (PARITY_NOTES #22)."""
    pad = k // 2
    h, w = x.shape[0], x.shape[1]
    y = jnp.pad(x, ((pad, pad), (0, 0), (0, 0)))
    y = sum(y[d:d + h] for d in range(k))
    y = jnp.pad(y, ((0, 0), (pad, pad), (0, 0)))
    return sum(y[:, d:d + w] for d in range(k))


def _downsample2(img: jax.Array) -> jax.Array:
    """2x2 average-pool downsample of an HW image (floor semantics)."""
    h, w = img.shape
    h2, w2 = h // 2, w // 2
    img = img[: 2 * h2, : 2 * w2]
    return img.reshape(h2, 2, w2, 2).mean(axis=(1, 3))


def _gradients(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Central-difference spatial gradients with edge clamping."""
    padded = jnp.pad(img, 1, mode="edge")
    ix = (padded[1:-1, 2:] - padded[1:-1, :-2]) * 0.5
    iy = (padded[2:, 1:-1] - padded[:-2, 1:-1]) * 0.5
    return ix, iy


def _bilinear_take(img: jax.Array, ys: jax.Array, xs: jax.Array
                   ) -> jax.Array:
    """Clamped bilinear sampling of (H, W, C) at (ys, xs) via ONE FLAT
    1-D take.

    ``jax.scipy.ndimage.map_coordinates`` lowers to XLA's generic N-D
    gather, which the TPU backend executes poorly. Three rewrites, all
    bit-identical (tests/test_temporal.py):
    - flatten to linear indices and gather rows of a 2-D array (the
      repo's bf16-tile-gather lesson, applied to warps);
    - pre-pair each pixel with its +x neighbor (edge-padded, so the
      pairing IS the x-clamp) so one take fetches both x-interpolation
      taps (r3: 21.3 -> 8.9 ms at 540x960x3);
    - r4: pre-pair the +y row as well — the quad array holds all FOUR
      bilinear taps [(y,x), (y+1,x), (y,x+1), (y+1,x+1)] per linear
      index, so the whole interpolation needs ONE take instead of two.
      The gather is DESCRIPTOR-bound, not slice-byte-bound (c=1 and c=3
      cost the same), so halving descriptors again is nearly free
      bandwidth-wise (the quad build is a sequential-read concat).
    This sits on the temporal chain's sequential critical path once per
    frame plus once per LK iteration. Semantics match
    map_coordinates(order=1, mode="nearest"): coordinates clamp to the
    edge — the +1 row/column of the edge-padded image IS the clamp at
    both borders.
    """
    h, w, c = img.shape
    return _quad_sample(_quad_pack(img), h, w, c, ys, xs)


def _quad_pack(img: jax.Array) -> jax.Array:
    """Build the 4-tap gather table for :func:`_quad_sample`.

    (H+1, W+1, C) edge pad — the duplicated last row/column make y0+1 /
    x0+1 at the border read the clamped tap (== min(y0+1, h-1)) — then
    ``quad[y*(w+1)+x] = [(y,x), (y+1,x), (y,x+1), (y+1,x+1)]``. Split
    from the sampling so LK can build it ONCE per level and reuse it
    across every refinement iteration (the warped image i2 is
    loop-invariant; only the sample coordinates change)."""
    h, w, c = img.shape
    w1 = w + 1
    pad = jnp.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")
    flat = pad.reshape((h + 1) * w1, c)
    rowpair = jnp.concatenate([flat[:-w1], flat[w1:]], axis=1)
    return jnp.concatenate([rowpair[:-1], rowpair[1:]], axis=1)


def _quad_sample(quad: jax.Array, h: int, w: int, c: int,
                 ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample a :func:`_quad_pack` table at (ys, xs), bilinear, clamped."""
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    fy = (ys - y0f)[..., None]
    fx = (xs - x0f)[..., None]
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    g = jnp.take(quad, (y0 * (w + 1) + x0).reshape(-1), axis=0)
    g = g.reshape(ys.shape + (4, c))
    a, c0 = g[..., 0, :], g[..., 1, :]   # (y0,x0), (y1,x0)
    b, d = g[..., 2, :], g[..., 3, :]    # (y0,x1), (y1,x1)
    return (a * (1 - fx) + b * fx) * (1 - fy) \
        + (c0 * (1 - fx) + d * fx) * fy


def _warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp an HW image by flow (dx,dy), bilinear, clamped."""
    h, w = img.shape
    ys = jnp.arange(h, dtype=flow.dtype)[:, None] + flow[..., 1]
    xs = jnp.arange(w, dtype=flow.dtype)[None, :] + flow[..., 0]
    return _bilinear_take(img[..., None], ys, xs)[..., 0]


def _lk_refine(i1: jax.Array, i2: jax.Array, flow: jax.Array,
               window: int, iters: int, eps: float) -> jax.Array:
    h, w = i2.shape
    # the gather table over i2 is loop-invariant: build it ONCE per level
    # instead of per iteration (hoisted explicitly — don't rely on XLA's
    # loop-invariant code motion reaching through the scan body)
    quad = _quad_pack(i2[..., None])
    gy = jnp.arange(h, dtype=flow.dtype)[:, None]
    gx = jnp.arange(w, dtype=flow.dtype)[None, :]

    def one_iter(flow, _):
        warped = _quad_sample(quad, h, w, 1,
                              gy + flow[..., 1], gx + flow[..., 0])[..., 0]
        ix, iy = _gradients(warped)
        it = warped - i1

        # all five window sums ride one fused shift-add stencil over the
        # 5-channel stack (see _box_filter: the 5-lane grouped conv this
        # replaced ran at ~22 GB/s effective)
        s = _box_filter(
            jnp.stack([ix * ix, ix * iy, iy * iy, ix * it, iy * it],
                      axis=-1), window)
        axx = s[..., 0] + eps
        axy = s[..., 1]
        ayy = s[..., 2] + eps
        bx = -s[..., 3]
        by = -s[..., 4]
        det = axx * ayy - axy * axy
        du = (ayy * bx - axy * by) / det
        dv = (axx * by - axy * bx) / det
        # clamp per-iteration update for stability
        du = jnp.clip(du, -window, window)
        dv = jnp.clip(dv, -window, window)
        return flow + jnp.stack([du, dv], axis=-1), None

    flow, _ = jax.lax.scan(one_iter, flow, None, length=iters)
    return flow


@functools.partial(jax.jit,
                   static_argnames=("levels", "iters", "window", "scale"))
def dense_flow(
    img1: jax.Array,      # (H, W) grayscale float in [0, 1]
    img2: jax.Array,
    levels: int = 4,
    iters: int = 4,
    window: int = 15,
    eps: float = 1e-4,
    scale: int = 1,
) -> jax.Array:
    """Dense flow img1 -> img2, returns (H, W, 2) float32 (dx, dy).

    ``scale`` in (2, 4) skips the finest pyramid level(s): LK runs on a
    ``scale``-x downsampled pair and the displacement field is bilinearly
    upsampled back to full resolution (x ``scale``). The finest level is
    ~70% of the cost and stylization guides rarely need sub-pixel flow
    (``inference.temporal.flow_scale`` / ``tools/optical_flow.py --scale``;
    measured 119 -> 90 ms/frame on the serving chain prologue,
    docs/perf/ab_temporal_prep_r3_flowscale.json). ``scale=1`` is exact.
    """
    if scale not in (1, 2, 4):
        raise ValueError(f"scale={scale!r}: expected 1, 2 or 4")
    full_hw = img1.shape
    i1 = img1.astype(jnp.float32)
    i2 = img2.astype(jnp.float32)
    s = scale
    while s > 1:
        i1, i2 = _downsample2(i1), _downsample2(i2)
        s //= 2
    pyr: List[Tuple[jax.Array, jax.Array]] = [(i1, i2)]
    for _ in range(levels - 1):
        a, b = pyr[-1]
        if min(a.shape) // 2 < max(8, window):
            break
        pyr.append((_downsample2(a), _downsample2(b)))

    a, b = pyr[-1]
    flow = jnp.zeros((*a.shape, 2), jnp.float32)
    for level in range(len(pyr) - 1, -1, -1):
        a, b = pyr[level]
        if flow.shape[:2] != a.shape:
            # upsample flow to this level and scale displacements by 2
            flow = 2.0 * jax.image.resize(
                flow, (*a.shape, 2), method="bilinear")
        flow = _lk_refine(a, b, flow, window, iters, eps)
    if scale > 1:
        flow = scale * jax.image.resize(
            flow, (*full_hw, 2), method="bilinear")
    return flow


@jax.jit
def warp_image(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp an (H, W, C) image by flow (dx, dy), bilinear, clamped.

    Used for the temporal guide: ``warp(stylized[i-1], flow[i-1 -> i])``
    predicts frame i's stylization from frame i-1's. Sampling rides the
    flat-take formulation (_bilinear_take) — the TPU-fast equivalent of
    map_coordinates(order=1, mode="nearest").
    """
    h, w, _ = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + flow[..., 1]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + flow[..., 0]
    warped = _bilinear_take(img.astype(jnp.float32), ys, xs)
    return warped.astype(img.dtype)


def masked_flow(img1: jax.Array, img2: jax.Array, mask: jax.Array,
                **kwargs) -> jax.Array:
    """dense_flow with out-of-mask zeroing (reference optical_flow.py:94-99:
    ``flow[~mask] = 0``)."""
    flow = dense_flow(img1, img2, **kwargs)
    return flow * (mask.astype(jnp.float32) > 0.5)[..., None]


def pil_gray(rgb: jax.Array) -> jax.Array:
    """Bit-exact PIL ``Image.convert("L")`` luma from (H, W, 3) RGB.

    Pillow converts with ITU-R 601 coefficients in 16.16 fixed point,
    round-half-up: ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16``
    (Pillow src/libImaging/Convert.c, L24 macro). tools/optical_flow.py
    feeds PIL-grayscale frames to :func:`dense_flow`; computing the SAME
    bytes on device lets the inference engine derive temporal-chain flow
    from already-uploaded frames (``inference.temporal.flow_source=device``)
    with no flow upload and no offline preprocessing pass.

    Float inputs in [-1, 1] (the engine's normalized representation) are
    first converted back to their exact source bytes — the k/255*2-1 grid
    spacing is ~7.8e-3, so round() is immune to 1-ulp normalization drift.
    """
    if rgb.dtype != jnp.uint8:
        rgb = jnp.round(
            jnp.clip((rgb.astype(jnp.float32) + 1.0) * 127.5,
                     0.0, 255.0)).astype(jnp.uint8)
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        jnp.uint8)
