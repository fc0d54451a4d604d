"""Whole-frame tiled inference engine.

TPU-native rebuild of the reference ``StyleTransferInference``
(generator.py:18-705). The reference loops tiles one-by-one through the
generator in Python (generator.py:500-515 — the performance cliff); here a
frame is one compiled program: gather ALL tiles with a vmapped dynamic_slice,
run the generator over the whole tile batch on the MXU (bf16 by default,
fp32 accumulation), scatter-accumulate with the Gaussian windows via
lax.scan, normalize, composite with the eroded mask, and convert to uint8 —
all inside one jit per (frame-size, tile-bucket) signature.

Semantics preserved from the reference:
- checkpoint channel sniff (generator.py:115-129) — works for both this
  build's orbax checkpoints and reference torch ``.ckpt`` files;
- mask threshold 0.4 + 7x7 full-support erosion (generator.py:327-351);
- tile grid from the eroded mask's nonzero list (generator.py:353-398);
- center-padding of clipped edge tiles (generator.py:467-498) and the
  top-left-anchored scatter of the generator output (generator.py:541-547);
- Gaussian window on the clipped box, bilinearly resized to the patch size
  (generator.py:527-539);
- weight-normalized blend + mask composite (generator.py:557-563);
- uint8 conversion (generator.py:643-652), per-file error resilience
  (generator.py:700-705), debug patch-rectangle overlay (generator.py:301-325).
"""

from __future__ import annotations

import functools
import logging
import os
import threading
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.data.io import (
    find_corresponding_image,
    list_images,
    load_image_channels,
    load_mask,
    save_image_uint8,
)
from patch_toon_tpu.infer.tiling import (
    Box,
    bucket_size,
    frames_per_dispatch,
    pack_boxes,
    tile_boxes_from_mask,
)
from patch_toon_tpu.ops.masks import erode_full_support_np
from patch_toon_tpu.utils.logging import configure_logging
from patch_toon_tpu.train.checkpoints import sniff_input_channels
from patch_toon_tpu.train.model import StyleTransferModel, _resolve_dtype


def _to_signed_unit(frame):
    """uint8 [0,255] -> fp32 [-1,1] via the exact reference normalization
    arithmetic (reference dataset.py:191 ToTensor+Normalize: /255*2-1);
    float frames pass through untouched.

    Every inference program accepts either representation: uint8 upload
    moves normalization on-device, cutting H2D bytes 4x — the upload is
    the dominant wire cost through a constrained link (fp32 c6 frame =
    ~11 MB vs the 1.4 MB uint8 readback; tools/profile_transport.py
    h2d_* rows). The dtype is static at trace time, so the fp32 path
    compiles to the identical program as before."""
    if frame.dtype == jnp.uint8:
        return frame.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return frame


@functools.partial(jax.jit, static_argnames=("depth",))
def _temporal_prep(frame, prev, flow, depth: int):
    """Fused temporal-frame prologue: ONE device dispatch builds the
    (H, W, 3+depth) generator input from the uploaded frame, the
    device-resident previous stylized output, and the flow field.

    Run eagerly this was normalize + ``warp_image`` (whose
    ``map_coordinates`` lowers to dozens of separate eager ops) + slice +
    cast + concat — every op a round-trip of dispatch latency on a remote
    transport, riding the temporal chain's SEQUENTIAL critical path (frame
    i+1 cannot start until this completes for frame i). ``prev``/``flow``
    may be None (chain start / missing flow); None is static pytree
    structure, so each of the three variants traces once into its own
    fully fused program. ``flow`` may arrive as float16 (see
    ``inference.temporal.flow_upload``) — warp coordinates are always
    computed in fp32.
    """
    from patch_toon_tpu.ops.flow import warp_image

    fdev = _to_signed_unit(frame)
    if prev is None:
        guide = fdev[..., :3]          # chain bootstrap: own RGB
    elif flow is None:
        guide = prev                   # missing flow: hold previous output
    else:
        guide = warp_image(prev, flow.astype(jnp.float32))
    return jnp.concatenate(
        [fdev, guide[..., :depth].astype(jnp.float32)], axis=-1)


@functools.partial(jax.jit, static_argnames=("scale",))
def _temporal_device_flow(frame, prev_gray, fmask, scale: int = 1):
    """One dispatch: PIL-exact grayscale of this frame + pyramidal-LK
    backward flow against the previous frame's (device-resident) grayscale.

    At ``scale=1`` this is the same computation ``tools/optical_flow.py``
    backend="tpu" writes to ``flow_bwd/{i}.npy`` — ``masked_flow(gray_i/
    255, gray_{i-1}/255, mask_i > 127)`` on bit-exact PIL luma (ops.flow.
    pil_gray) — so ``flow_source=device`` serves the identical chain with
    NO flow upload and no preprocessing pass. ``fmask`` None (maskless
    frame / mask dir ignored) skips the out-of-mask zeroing, like the
    tool would with an all-true mask.

    ``scale`` in (2, 4) runs LK on a 2x/4x-downsampled pyramid and
    bilinearly upsamples the displacement field — the finest pyramid
    level is ~70% of the LK cost, and a stylization guide rarely needs
    sub-pixel flow (inference.temporal.flow_scale; the out-of-mask
    zeroing still applies at FULL resolution, preserving the tool's mask
    semantics exactly).

    Returns (flow, gray): ``gray`` (uint8, H*W bytes) stays on device as
    the next frame's comparison target.
    """
    from patch_toon_tpu.ops.flow import dense_flow, pil_gray

    gray = pil_gray(frame[..., :3])
    flow = dense_flow(gray.astype(jnp.float32) / 255.0,
                      prev_gray.astype(jnp.float32) / 255.0, scale=scale)
    if fmask is not None:
        if fmask.ndim == 1:  # bit-packed wire form (load_flow_mask)
            fmask = jnp.unpackbits(
                fmask, count=gray.shape[0] * gray.shape[1]
            ).reshape(gray.shape)
        flow = flow * (fmask.astype(jnp.float32) > 0.5)[..., None]
    return flow, gray


@jax.jit
def _device_gray(frame):
    """Grayscale-only dispatch for the chain's first frame (no flow yet)."""
    from patch_toon_tpu.ops.flow import pil_gray

    return pil_gray(frame[..., :3])


def _mask_f32(mask, like=None):
    """Masks upload as fp32 planes, uint8 {0,1} planes (4x fewer bytes),
    or bit-PACKED uint8 (``np.packbits`` of the binary plane — 8x fewer
    wire bytes again, ~65 KB vs 519 KB at 540x960; the mask is the
    second-largest upload after the frame). Compute is always fp32.

    A packed mask is recognized by rank: ``like`` (the frame batch the
    mask belongs to) has 2 more axes — (..., H, W, C) vs (..., ceil(H*W/8))
    — and H, W are static inside the jitted program, so the unpack is one
    fused device op (``_mask_wire`` is the host-side encoder)."""
    if like is not None and mask.ndim == like.ndim - 2:
        h, w = like.shape[-3], like.shape[-2]
        bits = jnp.unpackbits(mask, axis=-1, count=h * w)
        return bits.reshape(*mask.shape[:-1], h, w, 1).astype(jnp.float32)
    return mask if mask.dtype == jnp.float32 else mask.astype(jnp.float32)


_TEMPORAL_LOCK_INIT = threading.Lock()


def _image_files(directory: Path) -> List[Path]:
    """Sorted image Paths in a directory — the SAME extension set the data
    layer accepts (data/io.list_images: .png/.jpg/.jpeg, any case). A bare
    ``glob('*.[pj][np][g]')`` silently missed ``.jpeg`` and uppercase
    extensions, so inference no-opped on inputs training handled fine.

    A missing/removed directory returns [] (glob's old semantics): the
    watch loops call this every poll, and deleting a stream subdirectory
    mid-watch must make that stream go quiet, not crash the service."""
    try:
        return [Path(directory) / f for f in list_images(directory)]
    except (FileNotFoundError, NotADirectoryError):
        return []


def _composite_u8(rgb, out, mask):
    """Masked composite + clip + uint8 tail shared by EVERY inference
    program (reference generator.py:562-563 + 643-652 semantics). Any
    change to the output convention must happen here, once — a missed
    site would silently break bit-parity between modes."""
    out = rgb * (1.0 - mask) + out * mask
    out = jnp.clip(out, -1.0, 1.0)
    u8 = jnp.round(
        jnp.clip((out + 1.0) * 127.5, 0.0, 255.0)).astype(jnp.uint8)
    return u8, out


def make_fullframe_fn(generator, h: int, w: int, c: int, dtype,
                      compiler_options=None) -> Any:
    """One whole-frame generator pass (the TPU-first fast path).

    The reference's tile decomposition exists because of its per-tile Python
    loop and GPU memory pressure; a TPU chip can push the entire frame
    through the fully-convolutional generator at once, eliminating the ~2x
    overlap redundancy of 30%-overlap tiling. NOTE: instance-norm statistics
    become per-frame instead of per-80x80-tile, so outputs differ slightly
    from the reference's tiled semantics — this mode is opt-in
    (``inference.mode: fullframe``); ``tiled`` is the parity default.
    """
    # generator needs H, W divisible by 4 (two stride-2 stages + 2x ups)
    hp = (h + 3) // 4 * 4
    wp = (w + 3) // 4 * 4

    def fn(g_vars, frame, mask):
        frame, mask = _to_signed_unit(frame), _mask_f32(mask, frame)
        x = jnp.pad(frame, ((0, hp - h), (0, wp - w), (0, 0)))
        out = generator.apply(
            g_vars, x[None].astype(dtype), train=False
        )[0, :h, :w].astype(jnp.float32)
        return _composite_u8(frame[:, :, :3], out, mask)

    return jax.jit(fn, compiler_options=compiler_options)


def make_batched_fullframe_fn(generator, h: int, w: int, c: int, dtype,
                              mesh=None, compiler_options=None) -> Any:
    """Multi-frame fullframe program, frames sharded over the mesh 'data'
    axis — the pod-scale streaming path (each chip stylizes its own frames;
    no cross-chip communication needed, pure throughput scaling)."""
    hp = (h + 3) // 4 * 4
    wp = (w + 3) // 4 * 4

    def body(g_vars, frames, masks):
        frames, masks = _to_signed_unit(frames), _mask_f32(masks, frames)
        x = jnp.pad(frames, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        out = generator.apply(
            g_vars, x.astype(dtype), train=False
        )[:, :h, :w].astype(jnp.float32)
        return _composite_u8(frames[..., :3], out, masks)

    if mesh is None:
        return jax.jit(body, compiler_options=compiler_options)

    from patch_toon_tpu.parallel.mesh import batch_sharding

    # caller device_puts frames/masks with batch sharding and g_vars
    # replicated; out_shardings pins the frame-sharded layout (frames shard
    # over ('dcn','data') on hybrid multi-slice meshes)
    b_shard = batch_sharding(mesh)
    return jax.jit(body, out_shardings=(b_shard, b_shard),
                   compiler_options=compiler_options)


def _gather_repr(x: jax.Array, dtype) -> Tuple[jax.Array, int]:
    """Re-express an array for the fast batched-slice path.

    The v5e fp32 batched dynamic_slice is pathological (~28-50 ms/frame vs
    ~0.4 ms for 16-bit elements — measured ~80x). bf16 compute casts before
    gathering (value-identical); fp32-parity compute bitcasts each fp32
    lane into two uint16 lanes, gathers, and bitcasts back — bit-exact.
    Returns (reexpressed array, lane multiplier)."""
    if jnp.dtype(dtype) != jnp.float32:
        return x.astype(dtype), 1
    u16 = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint16)
    return u16.reshape(*x.shape[:-1], x.shape[-1] * 2), 2


def _from_gather_repr(tile: jax.Array, c: int, mult: int) -> jax.Array:
    if mult == 1:
        return tile
    return jax.lax.bitcast_convert_type(
        tile.reshape(*tile.shape[:-1], c, 2), jnp.float32)


def _frame_body(generator, patch_size: int, bucket: int,
                h: int, w: int, c: int, dtype) -> Any:
    """The un-jitted one-frame tiled program (shared by the single-frame,
    and pod-sharded variants)."""
    ps = patch_size

    def frame_fn(g_vars, frame, boxes, weights, mask):
        # frame (H,W,C) fp32 [-1,1] or uint8 [0,255]; boxes (B,4) i32;
        # weights (B,ps,ps) f32; mask (H,W,1) f32/u8 {0,1}
        frame, mask = _to_signed_unit(frame), _mask_f32(mask, frame)
        repr_, mult = _gather_repr(frame, dtype)
        fpad = jnp.pad(repr_, ((ps, ps), (ps, ps), (0, 0)))

        def gather(box):
            y0, y1, x0, x1 = box[0], box[1], box[2], box[3]
            ph, pw = y1 - y0, x1 - x0
            hoff, woff = (ps - ph) // 2, (ps - pw) // 2
            tile = jax.lax.dynamic_slice(
                fpad, (ps + y0 - hoff, ps + x0 - woff, 0),
                (ps, ps, c * mult))
            tile = _from_gather_repr(tile, c, mult)
            r = jnp.arange(ps)
            rv = (r >= hoff) & (r < hoff + ph)
            cv = (r >= woff) & (r < woff + pw)
            return tile * rv[:, None, None].astype(tile.dtype) \
                * cv[None, :, None].astype(tile.dtype)

        tiles = jax.vmap(gather)(boxes)
        gen = generator.apply(
            g_vars, tiles, train=False
        ).astype(jnp.float32)

        canvas = jnp.zeros((h + ps, w + ps, 3), jnp.float32)
        wcanvas = jnp.zeros((h + ps, w + ps, 1), jnp.float32)

        def body(carry, inp):
            cv_, wv_ = carry
            tile, weight, box = inp
            y0, x0 = box[0], box[2]
            contrib = tile * weight[..., None]
            cur = jax.lax.dynamic_slice(cv_, (y0, x0, 0), (ps, ps, 3))
            cv_ = jax.lax.dynamic_update_slice(cv_, cur + contrib, (y0, x0, 0))
            curw = jax.lax.dynamic_slice(wv_, (y0, x0, 0), (ps, ps, 1))
            wv_ = jax.lax.dynamic_update_slice(
                wv_, curw + weight[..., None], (y0, x0, 0))
            return (cv_, wv_), None

        (canvas, wcanvas), _ = jax.lax.scan(
            body, (canvas, wcanvas), (gen, weights, boxes))

        out = canvas[:h, :w]
        wsum = wcanvas[:h, :w]
        out = out / jnp.where(wsum > 1e-8, wsum, 1.0)
        return _composite_u8(frame[:, :, :3], out, mask)

    return frame_fn


def make_frame_fn(generator, patch_size: int, bucket: int,
                  h: int, w: int, c: int, dtype,
                  compiler_options=None) -> Any:
    """Build the jitted one-frame program for a fixed signature."""
    return jax.jit(_frame_body(generator, patch_size, bucket, h, w, c, dtype),
                   compiler_options=compiler_options)


def make_pod_tiled_fn(generator, patch_size: int, bucket: int,
                      h: int, w: int, c: int, dtype, mesh=None,
                      compiler_options=None) -> Any:
    """Pod-scale TILED (reference-parity) inference: the one-frame tiled
    program vmapped over a frame batch, frames sharded over the mesh batch
    axes (('dcn','data') on hybrid meshes). Each chip stylizes its own
    frames end to end — tile gather, generator batch, scan blend, composite
    — with no cross-chip communication (pure throughput scaling). The
    fullframe counterpart is make_batched_fullframe_fn; this one keeps the
    reference's per-80x80-tile instance-norm semantics (generator.py:427-565).
    """
    body = _frame_body(generator, patch_size, bucket, h, w, c, dtype)

    def fn(g_vars, frames, boxes, weights, masks):
        # frames (F,H,W,C); boxes (F,B,4); weights (F,B,ps,ps); masks (F,H,W,1)
        return jax.vmap(
            lambda f, b, wt, m: body(g_vars, f, b, wt, m)
        )(frames, boxes, weights, masks)

    if mesh is None:
        return jax.jit(fn, compiler_options=compiler_options)

    from patch_toon_tpu.parallel.mesh import batch_sharding

    b_shard = batch_sharding(mesh)
    return jax.jit(fn, out_shardings=(b_shard, b_shard),
                   compiler_options=compiler_options)


def _multiframe_body(generator, patch_size: int, bucket: int, n_frames: int,
                     h: int, w: int, c: int, dtype) -> Any:
    """Traceable body shared by make_multiframe_fn (single chip) and
    make_pod_multiframe_fn (vmapped over a device axis)."""
    ps = patch_size

    def fn(g_vars, frames, fboxes, weights, masks):
        # frames (F,H,W,C) fp32 or uint8; fboxes (B,5) [f,y0,y1,x0,x1];
        # masks (F,H,W,1). Frames are flattened along H so the
        # gather/scatter stay 3D — dynamic slices on a 4D canvas cost
        # ~2x per scan iteration.
        frames, masks = _to_signed_unit(frames), _mask_f32(masks, frames)
        hp2 = h + 2 * ps
        # fast-path gather representation (see _gather_repr: fp32 batched
        # slices are ~80x slower on v5e; bf16 casts, fp32 bitcasts to uint16)
        repr_, mult = _gather_repr(frames, dtype)
        fpad = jnp.pad(repr_, ((0, 0), (ps, ps), (ps, ps), (0, 0))
                       ).reshape(n_frames * hp2, w + 2 * ps, c * mult)

        def gather(box):
            f, y0, y1, x0, x1 = box[0], box[1], box[2], box[3], box[4]
            ph, pw = y1 - y0, x1 - x0
            hoff, woff = (ps - ph) // 2, (ps - pw) // 2
            tile = jax.lax.dynamic_slice(
                fpad, (f * hp2 + ps + y0 - hoff, ps + x0 - woff, 0),
                (ps, ps, c * mult))
            tile = _from_gather_repr(tile, c, mult)
            r = jnp.arange(ps)
            rv = (r >= hoff) & (r < hoff + ph)
            cv = (r >= woff) & (r < woff + pw)
            return tile * rv[:, None, None].astype(tile.dtype) \
                * cv[None, :, None].astype(tile.dtype)

        tiles = jax.vmap(gather)(fboxes)
        gen = generator.apply(
            g_vars, tiles, train=False).astype(jnp.float32)

        hp1 = h + ps
        canvas = jnp.zeros((n_frames * hp1, w + ps, 3), jnp.float32)
        wcanvas = jnp.zeros((n_frames * hp1, w + ps, 1), jnp.float32)

        def body(carry, inp):
            cv_, wv_ = carry
            tile, weight, box = inp
            y0 = box[0] * hp1 + box[1]
            x0 = box[3]
            contrib = tile * weight[..., None]
            cur = jax.lax.dynamic_slice(cv_, (y0, x0, 0), (ps, ps, 3))
            cv_ = jax.lax.dynamic_update_slice(cv_, cur + contrib, (y0, x0, 0))
            curw = jax.lax.dynamic_slice(wv_, (y0, x0, 0), (ps, ps, 1))
            wv_ = jax.lax.dynamic_update_slice(
                wv_, curw + weight[..., None], (y0, x0, 0))
            return (cv_, wv_), None

        (canvas, wcanvas), _ = jax.lax.scan(
            body, (canvas, wcanvas), (gen, weights, fboxes))

        out = canvas.reshape(n_frames, hp1, w + ps, 3)[:, :h, :w]
        wsum = wcanvas.reshape(n_frames, hp1, w + ps, 1)[:, :h, :w]
        out = out / jnp.where(wsum > 1e-8, wsum, 1.0)
        return _composite_u8(frames[..., :3], out, masks)

    return fn


def make_multiframe_fn(generator, patch_size: int, bucket: int, n_frames: int,
                       h: int, w: int, c: int, dtype,
                       compiler_options=None) -> Any:
    """Several frames' tiles in ONE generator batch (tiled semantics kept).

    Co-batching frames fills the pow2 tile bucket (see
    tiling.frames_per_dispatch) — e.g. 3x170-tile 512p frames run at ~43
    eq-frames/s vs ~33 single-frame on a v5e chip. Per-tile math is identical
    to make_frame_fn; only the batching changes.
    """
    fn = _multiframe_body(generator, patch_size, bucket, n_frames, h, w, c,
                          dtype)
    return jax.jit(fn, compiler_options=compiler_options)


def make_pod_multiframe_fn(generator, patch_size: int, bucket: int,
                           fpd: int, h: int, w: int, c: int, dtype,
                           mesh=None, compiler_options=None) -> Any:
    """Pod x co-batched tiled inference: each device runs the fpd-frame
    multiframe program on its own frame chunk (frames chunked consecutively,
    chunks sharded over the mesh batch axes). Combines the pod path's
    linear chip scaling with co-batching's full pow2 tile buckets (~26%
    per-chip win over one-frame-per-chip at 170-tile 512p frames). Per-tile
    math identical to the single-chip programs (reference
    generator.py:427-565 semantics)."""
    body = _multiframe_body(generator, patch_size, bucket, fpd, h, w, c,
                            dtype)

    def fn(g_vars, frames, fboxes, weights, masks):
        # frames (D,fpd,H,W,C); fboxes (D,B,5); weights (D,B,ps,ps);
        # masks (D,fpd,H,W,1)
        return jax.vmap(
            lambda f, b, wt, m: body(g_vars, f, b, wt, m)
        )(frames, fboxes, weights, masks)

    if mesh is None:
        return jax.jit(fn, compiler_options=compiler_options)

    from patch_toon_tpu.parallel.mesh import batch_sharding

    b_shard = batch_sharding(mesh)
    return jax.jit(fn, out_shardings=(b_shard, b_shard),
                   compiler_options=compiler_options)


def _parse_crop_knob(value, knob: str = "crop_readback") -> bool:
    """Strict allow-list (like resolve_xla_options): a typo like 'of' or
    'disable' must raise, not silently enable cropping."""
    v = str(value).lower()
    if v in ("auto", "on", "true", "1", "yes"):
        return True
    if v in ("off", "false", "0", "no", "none", "disabled"):
        return False
    raise ValueError(
        f"inference.{knob}={value!r}: expected one of "
        "auto/on/true/1/yes or off/false/0/no/none/disabled")


def mask_support_bbox(mask: np.ndarray):
    """(y0, y1, x0, x1) bounds of a mask's nonzero support; (0,0,0,0) for
    an empty mask. The composite is out = rgb*(1-m) + styl*m, so every
    pixel that can differ from the input lies inside this box. Shared by
    the engine's prefetch path and bench.py's masked workload."""
    rows = np.flatnonzero(mask.any(axis=1))
    if not len(rows):
        return (0, 0, 0, 0)
    cols = np.flatnonzero(mask.any(axis=0))
    return (int(rows[0]), int(rows[-1]) + 1,
            int(cols[0]), int(cols[-1]) + 1)


def compute_crop_bbox(mask_boxes, h: int, w: int,
                      align: int = 64, full_frac: float = 0.85):
    """Readback bbox for a group of frames: the union of their mask-support
    bboxes, padded to ``align``-multiples (bounds the number of distinct
    slice shapes, so mask drift doesn't recompile). The mask support — not
    the tile union — is what bounds every pixel the composite can change.
    Returns None when any frame is maskless (stylized everywhere) or the
    union covers >= ``full_frac`` of the frame (cropping saves nothing).

    Module-level (not an engine method) so bench.py derives its masked-
    workload bbox from the SAME logic the engine ships."""
    if any(mb is None for mb in mask_boxes):
        return None  # maskless frames stylize everywhere
    live = [mb for mb in mask_boxes if mb[1] > mb[0]]
    if not live:
        live = [(0, 1, 0, 1)]  # all masks empty: fetch 1 row
    y0 = min(mb[0] for mb in live)
    y1 = max(mb[1] for mb in live)
    x0 = min(mb[2] for mb in live)
    x1 = max(mb[3] for mb in live)
    y0, x0 = (y0 // align) * align, (x0 // align) * align
    y1 = min(h, -(-y1 // align) * align)
    x1 = min(w, -(-x1 // align) * align)
    if (y1 - y0) * (x1 - x0) >= full_frac * h * w:
        return None  # near-full frame: cropping saves nothing
    return y0, y1, x0, x1


def upload_crop_window(boxes, h: int, w: int, ps: int,
                       bucket: int = 128, full_frac: float = 0.9,
                       support_bbox=None):
    """Crop window for UPLOADING a masked tiled frame (crop_upload).

    The tiled program only ever reads the frame inside the tile gather
    footprint — make_frame_fn's gather reads EXACTLY the ps x ps window
    centered on each (possibly short) box: rows [y0-hoff, y0-hoff+ps)
    with hoff = (ps-(y1-y0))//2, same for columns. The window is the
    union of that read footprint AND the mask-support bbox
    (``support_bbox``): tile placement stride-samples the nonzero list,
    so isolated speckle mask pixels can fall outside every tile — under
    the full-frame dispatch they composite to the zero canvas (uint8
    gray), and the host-side paste outside the window would instead keep
    the input bytes. With the support inside the window, every pixel the
    composite can touch is computed by the SAME program arithmetic, so
    cropping frame+mask to the window BEFORE upload, running the program
    on the small domain (tile boxes shifted by the crop origin), and
    pasting the output back into the input bytes host-side is
    BIT-IDENTICAL to the full-frame dispatch: reads beyond the window
    are zero-pad in both domains (outside the frame) or never happen,
    and outside the window the mask is zero (composite == input bytes).

    Window dims bucket up to ``bucket``-multiples (clipped to the frame)
    so mask drift across a shot reuses one compiled program; the origin
    slides to keep the window inside the frame. Returns None when the
    bucketed window covers >= ``full_frac`` of the frame (no saving) or
    there are no tiles."""
    if not boxes:
        return None
    rd = []
    for y0b, y1b, x0b, x1b in boxes:
        hoff = (ps - (y1b - y0b)) // 2
        woff = (ps - (x1b - x0b)) // 2
        rd.append((y0b - hoff, y0b - hoff + ps,
                   x0b - woff, x0b - woff + ps))
    if support_bbox is not None and support_bbox[1] > support_bbox[0]:
        sy0, sy1, sx0, sx1 = support_bbox
        rd.append((sy0, sy1, sx0, sx1))
    uy0 = max(0, min(r[0] for r in rd))
    uy1 = min(h, max(r[1] for r in rd))
    ux0 = max(0, min(r[2] for r in rd))
    ux1 = min(w, max(r[3] for r in rd))
    bh = min(h, -(-(uy1 - uy0) // bucket) * bucket)
    bw = min(w, -(-(ux1 - ux0) // bucket) * bucket)
    if bh * bw >= full_frac * h * w:
        return None
    y0 = max(0, min(uy0, h - bh))
    x0 = max(0, min(ux0, w - bw))
    return y0, y0 + bh, x0, x0 + bw


class StyleTransferInference:
    def __init__(self, cfg: Any):
        self.cfg = cfg
        inf = cfg.get("inference", {})
        self.debug_mode = bool(inf.get("debug_mode", False))
        self.mode = str(inf.get("mode", "tiled"))  # tiled (parity) | fullframe
        self.overlap_percent = float(inf.get("overlap_percent", 30.0))
        # co-batch budget: 'auto' frames_per_dispatch fills (but never
        # exceeds) this many tiles per dispatch. 512 is the measured
        # per-real-tile optimum on v5e (docs/perf/bucket_sweep_r3.json:
        # 512@109 vs 1024@112 us/tile, and bigger dispatches coarsen the
        # readback granularity).
        self.max_tile_batch = int(inf.get("tile_batch", 512))
        tcfg = inf.get("temporal") or {}
        self.temporal_enabled = bool(tcfg.get("enabled", False))
        self.temporal_flow_dir = tcfg.get("flow_dir")
        self.temporal_depth = int(tcfg.get("depth", 3))
        self.temporal_format = str(tcfg.get("file_format", "%03d"))
        # flow_source=device: derive the backward flow ON DEVICE from the
        # already-uploaded frames (ops.flow pyramidal LK over bit-exact
        # PIL-luma grayscale — the same computation tools/optical_flow.py
        # backend="tpu" writes to .npy), eliminating both the flow upload
        # (the largest temporal-mode H2D transfer) and the offline
        # preprocessing pass. "files" reads flow_dir .npy (default).
        self.temporal_flow_source = str(
            tcfg.get("flow_source", "files")).lower()
        if self.temporal_flow_source not in ("files", "device"):
            raise ValueError(
                f"inference.temporal.flow_source="
                f"{self.temporal_flow_source!r}: expected files/device")
        # flow_scale (device source only): LK on a 2x/4x-downsampled
        # pyramid, displacements upsampled — ~3x cheaper flow for guides
        # that don't need sub-pixel accuracy; 1 = the tool's exact flow
        self.temporal_flow_scale = int(tcfg.get("flow_scale", 1))
        if self.temporal_flow_scale not in (1, 2, 4):
            raise ValueError(
                f"inference.temporal.flow_scale="
                f"{self.temporal_flow_scale!r}: expected 1, 2 or 4")
        # resolved below once self.upload_u8 is known ("auto" follows it)
        self._temporal_flow_upload = str(
            tcfg.get("flow_upload", "auto")).lower()
        # single source for the inference precision: self.dtype (tile/frame
        # compute) and the model's conv-precision policy (_setup_model) must
        # read the SAME value or an fp32-trained checkpoint would pay
        # HIGHEST-precision convs on bf16-truncated inputs
        self.precision = inf.get("precision", "bf16")
        self.dtype = _resolve_dtype(self.precision) or jnp.float32
        # inference.quantize: "int8" serves every generator conv (except
        # the 1x1 output head) as w8a8 on the int8 MXU (models/layers.py
        # QuantConv; measured throughput in the QuantConv docstring —
        # a wash under the shipped tuned XLA options). Activation scales
        # calibrate automatically on the first frame (one fp forward).
        # A throughput/quality knob, NOT bit-parity; off by default.
        q = str(inf.get("quantize", "off")).lower()
        if q in ("off", "false", "0", "no", "none"):
            self.quantize = None
        elif q in ("int8", "w8a8"):
            self.quantize = "int8"
        else:
            raise ValueError(
                f"inference.quantize={q!r}: expected int8/w8a8 or "
                "off/false/0/no/none")
        # inference.devices: 1 = single chip; N = frames sharded over an
        # N-chip 'data' mesh (pod streaming); -1 = all chips
        self.devices = int(inf.get("devices", 1))
        # crop the D2H readback to the stylized (mask-support) bbox; outside
        # the mask the composite equals the input bytes exactly, so the
        # frame is reconstructed host-side bit-identically. Big win on
        # slow/congested transports when the mask covers part of the frame.
        self.crop_readback = _parse_crop_knob(
            inf.get("crop_readback", "auto"))
        # inference.crop_upload: crop frame+mask to the (bucketed) tile
        # read-union window BEFORE upload in masked tiled runs — cuts BOTH
        # wire directions, bit-identically (see upload_crop_window).
        # "auto" (default) follows crop_readback, so crop_readback=off
        # still means full frames end-to-end; "on" forces it regardless.
        cu_raw = str(inf.get("crop_upload", "auto")).lower()
        if cu_raw == "auto":
            self.crop_upload = self.crop_readback
        else:
            self.crop_upload = _parse_crop_knob(cu_raw, knob="crop_upload")
        # concurrent D2H fetch streams: the axon tunnel (and remote
        # transports generally) multiplex — 6 thread-fetches measured 2.1x
        # one serial fetch's bandwidth, saturating near 6-8 streams
        # (tools/profile_transport.py, docs/perf/transport_r3.json).
        # 1 = serial drain.
        self.readback_streams = max(1, int(inf.get("readback_streams", 6)))
        # inference.upload: u8 uploads frames/masks as uint8 and normalizes
        # on-device (4x fewer H2D bytes — the upload dwarfs the uint8
        # readback on constrained links; tools/profile_transport.py h2d_*).
        # Identical normalization arithmetic, byte-identical outputs
        # (tests/test_u8_upload.py). f32 keeps host-side normalization.
        up = str(inf.get("upload", "auto")).lower()
        if up == "auto":
            # strict fp32 bit-parity mode keeps host-side normalization:
            # TPU fp32 division is not guaranteed to round identically to
            # the host's IEEE divide, and precision=32's contract is
            # bit-parity with the torch oracle. bf16/32_fast absorb a
            # potential 1-ulp difference anyway (e2e bound is ±1 count).
            self.upload_u8 = self.precision not in (32, "32")
        elif up in ("u8", "uint8"):
            self.upload_u8 = True
        elif up in ("f32", "float32", "fp32"):
            self.upload_u8 = False
        else:
            raise ValueError(
                f"inference.upload={up!r}: expected auto/u8/f32")
        # inference.mask_upload: binary masks bit-pack for the wire
        # (np.packbits, 8x fewer bytes than the uint8 plane; exact in all
        # precision modes — see _mask_wire). "plane" restores the dense
        # (H, W, 1) upload.
        mu = str(inf.get("mask_upload", "packed")).lower()
        if mu in ("packed", "auto", "bits"):
            self.mask_packed = True
        elif mu == "plane":
            self.mask_packed = False
        else:
            raise ValueError(
                f"inference.mask_upload={mu!r}: expected packed/plane")
        # inference.temporal.flow_upload: the flow .npy is the LARGEST
        # per-frame H2D transfer in temporal mode (H*W*2 fp32 ≈ 4.1 MB at
        # 540x960 — more than the uint8 frame itself). f16 halves it; the
        # ~2^-10 relative coordinate quantization is far below the LK flow
        # estimator's own error, and warp math stays fp32 on device.
        # "auto" follows the upload gate: f16 whenever frames go uint8,
        # f32 under the strict precision=32 bit-parity contract.
        if self._temporal_flow_upload == "auto":
            self.temporal_flow_f16 = self.upload_u8
        elif self._temporal_flow_upload in ("f16", "float16", "half"):
            self.temporal_flow_f16 = True
        elif self._temporal_flow_upload in ("f32", "float32", "fp32"):
            self.temporal_flow_f16 = False
        else:
            raise ValueError(
                f"inference.temporal.flow_upload="
                f"{self._temporal_flow_upload!r}: expected auto/f16/f32")
        from patch_toon_tpu.utils.xla_options import resolve_xla_options

        # per-compile XLA option tuning (docs/perf/xla_ab.json); "auto"
        # applies the measured TPU winner, "none" the compiler defaults
        self.xla_options = resolve_xla_options(inf.get("xla_options", "auto"))
        self._mesh = None
        self._g_vars_sharded = None
        self.patch_size = int(cfg.data.patch_size)
        self.patch_positions: List[Box] = []
        self.logger = logging.getLogger("patch_toon_tpu.infer")
        # force-replaces root handlers: absl/plugin imports often install
        # their own first, which would silently swallow these INFO lines
        configure_logging(
            logging.DEBUG if self.debug_mode else logging.INFO)
        self.logger.setLevel(
            logging.DEBUG if self.debug_mode else logging.INFO)
        self._load_data_config()
        self._setup_model()
        self._frame_fns: Dict[Tuple[int, int, int, int], Any] = {}
        # Device-resident (packed boxes, Gaussian weights) keyed by the
        # exact tile-box layout: the weights table is bucket*ps*ps fp32
        # (13 MB at bucket 512) and tile boxes recur EXACTLY for static
        # masks — including the maskless streaming workload, where every
        # frame tiles identically — so re-uploading it per dispatch rode
        # the transport-capped wire for nothing (review r3). Small FIFO:
        # a shot holds one or a few distinct layouts.
        self._pack_cache: Dict[Any, Any] = {}
        self._pack_cache_cap = 8
        # created eagerly so the hot registration path never touches the
        # module-global init lock (_temporal_lock keeps a lazy fallback
        # only for bare instances built without __init__ in tests)
        self._temporal_members_lock = threading.RLock()
        self._temporal_members: set = set()

    # ------------------------------------------------------------------

    def _load_data_config(self) -> None:
        """Resolve guide channels from cfg.paths.additional_channels
        (reference generator.py:196-271, incl. band-count validation)."""
        from PIL import Image

        self.additional_channels: Dict[str, Dict[str, Any]] = {}
        paths_cfg = self.cfg.get("paths", {})
        for name, ccfg in (paths_cfg.get("additional_channels") or {}).items():
            if isinstance(ccfg, dict):
                path, depth = str(ccfg["path"]), int(ccfg.get("depth", 1))
            else:
                path, depth = str(ccfg), 1
            cdir = Path(path)
            if not cdir.exists():
                raise FileNotFoundError(f"Channel directory not found: {cdir}")
            samples = _image_files(cdir)
            if not samples:
                raise FileNotFoundError(f"No images found in {path}")
            actual = len(Image.open(samples[0]).getbands())
            if actual < depth:
                raise ValueError(
                    f"Channel {name} has insufficient channels: "
                    f"expected {depth}, but found {actual}")
            self.additional_channels[name] = {"path": path, "depth": depth}
        self.total_channels = 3 + sum(
            c["depth"] for c in self.additional_channels.values())
        if self.temporal_enabled:
            # temporal guide: flow-warped previous stylized frame appended as
            # the last input channels (no reference equivalent; see README)
            self.total_channels += self.temporal_depth

    def _setup_model(self) -> None:
        ckpt_path = str(self.cfg.paths.checkpoint)
        ckpt_channels = sniff_input_channels(ckpt_path)
        if ckpt_channels != self.total_channels:
            raise ValueError(
                f"Channel count mismatch! Checkpoint model expects "
                f"{ckpt_channels} channels, but current configuration has "
                f"{self.total_channels} channels.")  # generator.py:120-129

        from patch_toon_tpu.config import to_container

        gen_cfg = to_container(self.cfg.model.generator)
        gen_cfg.setdefault("args", {})
        # Orbax checkpoints are fully self-describing: the meta sidecar
        # carries the resolved generator args (filters, resnet_blocks, ...),
        # so non-default architectures stylize without manual model config.
        # (The reference can only sniff the channel width from a torch
        # state_dict, generator.py:115-129.)
        if Path(ckpt_path).is_dir():
            from patch_toon_tpu.train.checkpoints import CheckpointManager

            meta_args = CheckpointManager.read_meta(ckpt_path).get(
                "generator_args")
            if meta_args:
                gen_cfg["args"].update(meta_args)
        gen_cfg["args"]["input_channels"] = int(ckpt_channels)
        gen_cfg["args"]["additional_channels"] = None

        training_cfg = dict(to_container(self.cfg.training))
        training_cfg["precision"] = self.precision
        self.model = StyleTransferModel(
            generator_config=gen_cfg,
            discriminator_config=None,
            training_config=training_cfg,
            optimizer_config=to_container(self.cfg.optimizer),
            data_config=to_container(self.cfg.data),
            perception_loss_config=None,
        )
        if Path(ckpt_path).is_dir():
            from patch_toon_tpu.train.checkpoints import restore_generator

            g_params, g_batch_stats = restore_generator(ckpt_path)
        else:
            state = self.model.init_state(jax.random.PRNGKey(0),
                                          patch_size=self.patch_size)
            state = self.model.load_torch_checkpoint(state, ckpt_path)
            g_params, g_batch_stats = state.g_params, state.g_batch_stats
        self.g_vars = {"params": g_params, "batch_stats": g_batch_stats}
        # Optional Pallas fused InstanceNorm+activation path. Off by default:
        # the standalone kernel beats XLA's IN by ~25%, but inside the whole
        # generator it blocks XLA's cross-op fusion and loses end-to-end
        # (measured on v5e) — kept as an opt-in knob for future kernels.
        if bool(self.cfg.get("inference", {}).get("fused_norm", False)):
            self.model.generator = self.model.generator.clone(fused_norm=True)
        if self.quantize:
            # programs trace QuantConv (w8a8 on the int8 MXU); the 'quant'
            # activation scales join g_vars at first-frame calibration
            self.model.generator = self.model.generator.clone(
                quant_mode="int8")
        self.logger.info(
            f"Model ready: {ckpt_channels} input channels from {ckpt_path}")

    # ------------------------------------------------------------------

    def _frame_fn(self, h: int, w: int, c: int, bucket: int) -> Any:
        key = (h, w, c, bucket)
        if key not in self._frame_fns:
            self._frame_fns[key] = make_frame_fn(
                self.model.generator, self.patch_size, bucket, h, w, c,
                self.dtype, compiler_options=self.xla_options)
        return self._frame_fns[key]

    def _ensure_quant(self, frame) -> None:
        """First-frame w8a8 calibration (inference.quantize=int8).

        Runs ONE fp generator forward over the whole first frame with
        QuantConv in calib mode, folding each conv input's absmax into the
        'quant' collection; the scales then ride self.g_vars into every
        program unchanged (the builders pass g_vars through). Whole-frame
        calibration covers the tiled programs too: instance norm keeps
        every conv input in a stable normalized range, so tile-level
        absmax tracks frame-level absmax (validated by the int8-vs-fp
        PSNR test). Scales are static afterwards — no per-dispatch
        reduction ever rides the serving path."""
        if not self.quantize or "quant" in self.g_vars:
            return
        calib = self.model.generator.clone(quant_mode="calib")
        x = _to_signed_unit(jnp.asarray(frame))  # u8 uploads normalize here
        h, w = x.shape[0], x.shape[1]
        # the generator's two stride-2 stages + 2x upsamples need /4 dims;
        # trimming a couple of edge rows is harmless for absmax statistics
        x = x[None, :h // 4 * 4, :w // 4 * 4, :].astype(self.dtype)
        fn = jax.jit(lambda v, xx: calib.apply(
            v, xx, train=False, mutable=["quant"])[1])
        mut = fn({k: v for k, v in self.g_vars.items() if k != "quant"}, x)
        self.g_vars = dict(self.g_vars, quant=mut["quant"])
        self._g_vars_sharded = None  # pod replicas rebuild with the scales
        n = len(jax.tree_util.tree_leaves(mut["quant"]))
        self.logger.info(
            f"int8 serving: calibrated {n} activation scales on the "
            "first frame")

    def _packed_cached(self, key, build):
        """Device-resident packed (boxes, weights) for a tile layout.

        ``build`` returns host arrays; the uploaded jnp arrays are cached
        so repeated layouts (static masks, the maskless full-frame grid)
        skip the multi-MB weights H2D on every later dispatch."""
        hit = self._pack_cache.get(key)
        if hit is None:
            hit = tuple(jnp.asarray(a) for a in build())
            if len(self._pack_cache) >= self._pack_cache_cap:
                self._pack_cache.pop(next(iter(self._pack_cache)))
            self._pack_cache[key] = hit
        return hit

    def _stylize_device(
        self,
        frame: np.ndarray,                 # (H,W,C) fp32 [-1,1]
        mask: Optional[np.ndarray] = None,  # (H,W) eroded {0,1}, or None
        overlap_percent: Optional[float] = None,
        boxes: Optional[List[Box]] = None,  # precomputed tile boxes
    ):
        """Dispatch one frame's stylization; returns the device uint8 array
        (async — fetch with np.asarray) and the tile boxes."""
        self._ensure_quant(frame)
        h, w, c = frame.shape
        if mask is None:
            mask = np.ones((h, w), np.float32)
        if self.mode == "fullframe":
            key = ("fullframe", h, w, c)
            if key not in self._frame_fns:
                self._frame_fns[key] = make_fullframe_fn(
                    self.model.generator, h, w, c, self.dtype,
                    compiler_options=self.xla_options)
            u8, out_float = self._frame_fns[key](
                self.g_vars, jnp.asarray(frame),
                jnp.asarray(self._mask_wire(mask)))
            return u8, out_float, []
        if boxes is None:
            boxes = tile_boxes_from_mask(
                mask, self.patch_size,
                self.overlap_percent if overlap_percent is None
                else overlap_percent)
        bucket = bucket_size(max(1, len(boxes)))
        packed_boxes, weights = self._packed_cached(
            ("single", tuple(map(tuple, boxes)), bucket),
            lambda: pack_boxes(boxes, self.patch_size, bucket)[:2])
        fn = self._frame_fn(h, w, c, bucket)
        u8, out_float = fn(self.g_vars, jnp.asarray(frame),
                           packed_boxes, weights,
                           jnp.asarray(self._mask_wire(mask)))
        return u8, out_float, boxes

    def process_large_image(
        self,
        frame: np.ndarray,
        mask: Optional[np.ndarray] = None,
        overlap_percent: Optional[float] = None,
    ) -> np.ndarray:
        """Stylize one frame; returns (H,W,3) uint8."""
        u8, _, boxes = self._stylize_device(frame, mask, overlap_percent)
        self.patch_positions = boxes
        return np.asarray(u8)

    def _load_frame(self, input_path: str,
                    with_rgb_u8: bool = False,
                    channels: Optional[dict] = None) -> Any:
        from patch_toon_tpu.data.io import _decode_rgb_uint8

        if channels is None:
            channels = self.additional_channels
        rgb_u8 = _decode_rgb_uint8(input_path)
        # upload_u8: keep every channel in its decoded uint8 form — all
        # guide channels are 8-bit sources with the same /255*2-1
        # normalization (data/io.py load_image_channels), which the
        # inference programs now apply on-device (_to_signed_unit)
        parts = [rgb_u8 if self.upload_u8
                 else rgb_u8.astype(np.float32) / 255.0 * 2.0 - 1.0]
        for name, ccfg in channels.items():
            cpath = find_corresponding_image(ccfg["path"], input_path)
            if not os.path.exists(cpath):
                raise FileNotFoundError(
                    f"Required channel {name} not found: {cpath}")
            if self.upload_u8:
                parts.append(_decode_rgb_uint8(cpath)[..., :ccfg["depth"]])
            else:
                parts.append(load_image_channels(cpath, ccfg["depth"]))
        frame = np.concatenate(parts, axis=-1)
        return (frame, rgb_u8) if with_rgb_u8 else frame

    def _mask_up(self, mask: np.ndarray) -> np.ndarray:
        """Host-side mask representation for upload: uint8 {0,1} when
        upload_u8 (lossless — the engine's own mask path binarizes), else
        fp32. A FRACTIONAL mask (possible via the public
        process_large_image API) must not be floored by the uint8 cast —
        it stays fp32, preserving the partial composite."""
        if not self.upload_u8:
            return mask
        u8 = mask.astype(np.uint8)
        if (u8 == mask).all():
            return u8
        return mask

    def _mask_wire(self, mask: np.ndarray) -> np.ndarray:
        """Wire form of an (eroded) mask batch (..., H, W) for upload.

        Binary masks bit-pack via ``np.packbits`` (8x fewer wire bytes
        than the uint8 plane; on a congested tunnel the H2D leg gates the
        streaming headline, bench.py transport_h2d_MBps). The programs
        unpack on device (``_mask_f32`` with ``like=``) — the {0,1} plane
        is reproduced bit-for-bit, so packing is exact in EVERY precision
        mode, including strict fp32 parity. Fractional masks (possible via
        the public ``process_large_image`` API) ship as fp32 planes.
        ``inference.mask_upload=plane`` restores the unpacked form."""
        if self.mask_packed:
            u8 = mask.astype(np.uint8)
            if (u8 == mask).all():
                return np.packbits(u8.reshape(*u8.shape[:-2], -1), axis=-1)
        return self._mask_up(mask)[..., None]

    def _load_eroded_mask(self, mask_path: str, shape_hw) -> Optional[np.ndarray]:
        mask_dir = os.path.dirname(mask_path)
        resolved = find_corresponding_image(mask_dir,
                                            os.path.basename(mask_path))
        if not os.path.exists(resolved):
            if mask_dir.endswith("ignore"):
                return None  # full-frame stylization
            raise FileNotFoundError(f"Mask file not found: {resolved}")
        mask = load_mask(resolved)  # >128 binarize, [0,1]
        if tuple(mask.shape) != tuple(shape_hw):
            raise ValueError(
                f"Mask {resolved} is {mask.shape}, frame is "
                f"{tuple(shape_hw)} — mask/frame resolutions must match")
        # host erosion: load_mask output is binary, for which the numpy
        # windowed-sum erosion is bit-identical to the device conv — and
        # skips a ~2 MB fp32 upload + ~2 MB readback per frame through
        # slow transports (the eroded result is what actually ships, as
        # uint8, inside the dispatch)
        return erode_full_support_np(mask)

    def process_image(self, input_path: str, mask_path: str,
                      save_path: str) -> None:
        frame = self._load_frame(input_path)
        mask = self._load_eroded_mask(mask_path, frame.shape[:2])
        out = self.process_large_image(frame, mask)
        save_image_uint8(out, save_path)
        if self.debug_mode:
            self._save_debug_overlay(out, save_path)
        self.logger.info(f"Saved {save_path}")

    def _save_debug_overlay(self, out: np.ndarray, save_path: str) -> None:
        """Random-color tile rectangles (reference generator.py:301-325)."""
        from PIL import Image, ImageDraw

        img = Image.fromarray(out.copy())
        draw = ImageDraw.Draw(img)
        rng = np.random.default_rng(0)
        for y0, y1, x0, x1 in self.patch_positions:
            color = tuple(int(v) for v in rng.integers(100, 256, 3))
            draw.rectangle([x0, y0, x1, y1], outline=color, width=2)
        debug_path = str(Path(save_path).with_name(
            f"debug_{Path(save_path).name}"))
        img.save(debug_path)

    def watch_directory(self) -> None:
        """Serve paths.input_dir as a long-running stylization service.

        Polls for frames that do not yet have an output and runs each new
        batch through the streaming pipeline. Compiled programs, device
        params and the inference process stay warm between polls, so
        steady-state latency is one dispatch — no reload/recompile per
        batch (a capability the reference's one-shot ``generator.py`` has
        no equivalent of). A frame is picked up once its mtime has settled
        (half-written files are retried on the next poll; decode failures
        fall under the per-file resilience of the pipeline).

        inference.watch: {enabled, poll_seconds, idle_timeout_seconds,
        max_attempts}. ``idle_timeout_seconds`` null/0 = run forever
        (Ctrl-C to stop). With the temporal guide enabled, the warp chain
        and the global flow index persist across polls, and a blocked
        frame (still settling, or missing its mask/guides) holds LATER
        frames back so the chain always advances in stream order;
        flow_bwd/{i}.npy is indexed by position in the whole stream.
        A subdirectory-per-video input layout routes to
        _watch_multistream (N persistent chains, co-batched generator).
        Multi-host flat-layout temporal watch serves from process 0 only;
        multi-stream shards whole streams; other modes shard frames by
        name hash.
        """
        import time as _time

        if self.cfg.get("inference", {}).get("file_shard"):
            raise ValueError(
                "inference.watch shards by name hash automatically; "
                "file_shard's index round-robin is unstable across polls")
        import zlib

        wcfg = self.cfg.get("inference", {}).get("watch") or {}
        poll = float(wcfg.get("poll_seconds", 1.0))
        idle_timeout = float(wcfg.get("idle_timeout_seconds") or 0)
        max_attempts = int(wcfg.get("max_attempts", 3))
        input_dir = Path(self.cfg.paths.input_dir)
        output_dir = Path(self.cfg.paths.output_dir)
        if self.temporal_enabled and self._detect_streams(input_dir):
            # subdirectory-per-video layout: serve N persistent interleaved
            # warp chains with the generator co-batched across streams
            # (the layout is decided ONCE, at watch start)
            return self._watch_multistream(wcfg)
        if self.temporal_enabled and jax.process_count() > 1 \
                and jax.process_index() != 0:
            self.logger.warning(
                "Temporal watch is sequential; only process 0 serves "
                "(shard whole videos with the subdirectory-per-stream "
                "layout instead)")
            return
        # Multi-host watch: shard by a stable hash of the NAME (a list-index
        # round-robin would reassign frames between polls as the pending
        # list shrinks at different rates per process, double-writing the
        # same output from two hosts).
        nproc, me = jax.process_count(), jax.process_index()
        mask_dir = Path(self.cfg.paths.mask_dir)
        mask_optional = mask_dir.name.endswith("ignore")

        def aux_ready(p: Path) -> bool:
            """Producers often write the frame before its mask/guide
            channels — wait for ALL of a frame's inputs before counting an
            attempt (a frame whose mask never comes just stays pending)."""
            if not mask_optional and not os.path.exists(
                    find_corresponding_image(str(mask_dir), p.name)):
                return False
            for ccfg in self.additional_channels.values():
                if not os.path.exists(
                        find_corresponding_image(ccfg["path"], str(p))):
                    return False
            return True

        done: set = set()
        attempts: Dict[str, int] = {}
        # frames whose mask/guides haven't landed: first-seen time, so a
        # stuck producer is diagnosable (warned once per frame after
        # aux_warn_seconds, default 30s) instead of pending forever silently
        aux_warn_after = float(wcfg.get("aux_warn_seconds", 30.0))
        waiting_since: Dict[str, float] = {}
        aux_warned: set = set()
        idle = 0.0
        self.logger.info(
            f"Watching {input_dir} (poll {poll}s, "
            f"idle timeout {idle_timeout or 'none'})")
        while True:
            now = _time.time()
            new = []
            for p in _image_files(input_dir):
                if p.name in done or (output_dir / p.name).exists():
                    if self.temporal_enabled:
                        # already-stylized frames are stream members even
                        # across a service restart (their outputs prove it)
                        self._temporal_register(p.name)
                    done.add(p.name)
                    continue
                if nproc > 1 and not self.temporal_enabled \
                        and zlib.crc32(p.name.encode()) % nproc != me:
                    continue  # a peer's frame
                try:
                    if p.stat().st_mtime > now - max(0.25, poll / 2):
                        if self.temporal_enabled:
                            break  # chain order: later frames wait behind
                        continue  # possibly still being written
                except OSError:
                    if self.temporal_enabled:
                        break
                    continue
                if self.temporal_enabled:
                    # a frame joins the temporal stream only once its mtime
                    # settles: a transient half-write that gets deleted must
                    # never occupy a stream position (it would shift every
                    # later frame onto the wrong flow file). Registration is
                    # NOT gated on aux_ready — a frame waiting for its mask
                    # is a real stream member; and a given-up frame stays a
                    # member so a later retry keeps its position.
                    self._temporal_register(p.name)
                if not aux_ready(p):
                    first = waiting_since.setdefault(p.name, now)
                    if p.name not in aux_warned \
                            and now - first >= aux_warn_after:
                        aux_warned.add(p.name)
                        self.logger.warning(
                            f"{p.name}: mask/guide channels still missing "
                            f"after {now - first:.0f}s; frame stays pending "
                            "until they arrive")
                    if self.temporal_enabled:
                        break  # chain order: later frames wait behind
                    continue  # mask/guide not landed yet: retry next poll
                waiting_since.pop(p.name, None)
                aux_warned.discard(p.name)
                new.append(p)
            if new:
                try:
                    self.process_directory(files=new, progress=False)
                except Exception as e:
                    # the service must outlive a bad batch; per-frame
                    # attempts below decide retry vs give-up
                    self.logger.error(f"Batch failed: {e}")
                for p in new:
                    if (output_dir / p.name).exists():
                        done.add(p.name)
                        idle = 0.0
                    else:
                        # transient half-write: retry; persistent failure:
                        # give up so the poll loop can go idle (no spin)
                        attempts[p.name] = attempts.get(p.name, 0) + 1
                        if attempts[p.name] >= max_attempts:
                            self.logger.error(
                                f"Giving up on {p.name} after "
                                f"{max_attempts} attempts")
                            done.add(p.name)
                self.logger.info(f"Stylized {len(new)} new frame(s); "
                                 f"{len(done)} total")
            _time.sleep(poll)
            idle += poll
            if idle_timeout and idle >= idle_timeout:
                self.logger.info(
                    f"No new frames for {idle:.0f}s; stopping watch")
                return

    def process_directory(self, files: Optional[List[Path]] = None,
                          progress: bool = True) -> None:
        """Stylize every frame in paths.input_dir as a streaming pipeline.

        Same surface and per-file resilience as reference
        generator.py:674-705, but structured as overlapped stages: host
        decode runs ahead in a thread pool (native C++ PNG codec when
        available), device dispatches are pipelined at depth 2, and PNG
        encode/write happens in the native async writer — so the TPU never
        waits on IO.
        """
        from concurrent.futures import ThreadPoolExecutor

        from tqdm import tqdm

        from patch_toon_tpu.native import FrameWriter

        input_dir = Path(self.cfg.paths.input_dir)
        mask_dir = Path(self.cfg.paths.mask_dir)
        output_dir = Path(self.cfg.paths.output_dir)
        if not input_dir.exists():
            raise FileNotFoundError(f"Input directory not found: {input_dir}")
        if not mask_dir.name.endswith("ignore") and not mask_dir.exists():
            raise FileNotFoundError(f"Mask directory not found: {mask_dir}")
        output_dir.mkdir(parents=True, exist_ok=True)

        # Multi-stream temporal serving: a subdirectory-per-video layout
        # serves N independent warp chains on one chip, co-batching the
        # generator dispatch ACROSS streams (a single chain is sequential
        # and can't co-batch its own frames). Watch mode routes the same
        # layout through _watch_multistream before reaching here.
        if files is None and self.temporal_enabled:
            streams = self._detect_streams(input_dir)
            if streams:
                return self._process_multistream(
                    streams, input_dir, mask_dir, output_dir,
                    progress=progress)

        explicit_files = files is not None
        if files is None:
            files = _image_files(input_dir)

        # Multi-host pod streaming: per-frame stylization is stateless, so
        # hosts need NO communication — each worker takes a round-robin
        # slice of the frame list (inference.file_shard: "i/N") and drives
        # its own local chips (optionally with inference.devices > 1).
        shard = self.cfg.get("inference", {}).get("file_shard")
        if explicit_files:
            shard = False  # watch mode shards by name hash before calling
        if shard is None and jax.process_count() > 1:
            if self.temporal_enabled:
                self.logger.warning(
                    "Multi-host run with the temporal guide: frames chain "
                    "sequentially, so only process 0 stylizes (shard whole "
                    "videos across hosts instead)")
                if jax.process_index() != 0:
                    return
            else:
                # multi-host pod streaming: round-robin frame partition per
                # process (stateless per-frame work, no communication)
                shard = f"{jax.process_index()}/{jax.process_count()}"
        if shard:
            if self.temporal_enabled:
                raise ValueError(
                    "inference.file_shard is incompatible with the temporal "
                    "guide (frame i depends on frame i-1); shard videos, "
                    "not frames")
            idx, n = (int(x) for x in str(shard).split("/"))
            if not 0 <= idx < n:
                raise ValueError(f"file_shard {shard}: index out of range")
            files = files[idx::n]
            self.logger.info(f"File shard {idx}/{n}")
        self.logger.info(f"Found {len(files)} images to process")

        # crop_upload applies to masked tiled streaming only: fullframe
        # needs the whole frame (per-frame IN statistics), the temporal
        # chain warps full frames
        crop_up = (self.crop_upload and self.mode != "fullframe"
                   and not self.temporal_enabled)

        def load_one(input_path: Path):
            frame, rgb_u8 = self._load_frame(str(input_path),
                                             with_rgb_u8=True)
            mask = self._load_eroded_mask(
                str(mask_dir / input_path.name), frame.shape[:2])
            # Mask-support bbox for crop_readback — tile boxes can
            # under-cover the mask (stride-sampled speckle masks,
            # fullframe mode), so the bbox must come from the mask
            # itself. Computed here so the scans ride the prefetch
            # threads; maskless frames stylize everywhere (None).
            mbox = mask_support_bbox(mask) if mask is not None else None
            boxes = tile_boxes_from_mask(
                mask if mask is not None
                else np.ones(frame.shape[:2], np.float32),
                self.patch_size, self.overlap_percent)
            cropwin = None
            if crop_up and mask is not None:
                # the mask-support bbox rides along: stride-sampled tile
                # placement can skip speckle pixels, and those must land
                # inside the window for bit-parity (upload_crop_window)
                cropwin = upload_crop_window(boxes, *frame.shape[:2],
                                             self.patch_size,
                                             support_bbox=mbox)
            if cropwin is not None:
                # crop frame+mask to the window BEFORE upload and shift
                # the tile boxes into window coordinates — bit-identical
                # to the full-frame dispatch (see upload_crop_window);
                # rgb_u8 stays full for the host-side paste
                y0, y1, x0, x1 = cropwin
                frame = frame[y0:y1, x0:x1]
                mask = mask[y0:y1, x0:x1]
                boxes = [(b[0] - y0, b[1] - y0, b[2] - x0, b[3] - x0)
                         for b in boxes]
            if self.devices == 1:
                # upload from the prefetch thread: H2D overlaps the main
                # loop's compute + readback instead of serializing in
                # dispatch (the upload is the dominant wire cost on
                # constrained links — tools/ab_upload.py). Pod runs keep
                # host arrays: their upload targets a device_put sharding.
                frame = jax.device_put(frame)
            return frame, mask, rgb_u8, mbox, boxes, cropwin

        # (per-frame fetch Futures, per-frame tile boxes, save paths, crop)
        in_flight: List[Tuple[List[Any], List[List[Box]], List[Path],
                              Any]] = []
        writer = FrameWriter(num_threads=2)

        if self.temporal_enabled:
            self._process_directory_temporal(files, load_one, output_dir,
                                             writer, mask_dir=mask_dir,
                                             progress=progress)
            failed = writer.flush()
            writer.close()
            if failed:
                self.logger.error(f"{failed} frame writes failed")
            return

        # fetch pool: each in-flight group's D2H readback runs in its own
        # thread so transfers overlap on the wire — the tunnel multiplexes
        # (4 concurrent fetches measured 1.8x one serial fetch's bandwidth,
        # tools/profile_transport.py); a serial drain leaves that unused
        fetch_pool = ThreadPoolExecutor(max_workers=self.readback_streams)

        def drain_one():
            futs, group_boxes, save_paths, crop = in_flight.pop(0)
            failed = []  # (name, error) — the transfers are independent,
            # so one frame's failure must not drop its siblings' data
            for k, save_path in enumerate(save_paths):
                try:
                    img = futs[k].result()  # (H, W, 3) or cropped (bh,bw,3)
                except Exception as e:
                    failed.append((save_path.name, e))
                    continue
                if crop is not None:
                    bboxes, rgb_u8s = crop  # per-frame paste windows
                    y0, y1, x0, x1 = bboxes[k]
                    full = rgb_u8s[k].copy()
                    full[y0:y1, x0:x1] = img
                    img = full
                writer.submit(str(save_path), img)
                if self.debug_mode:
                    self.patch_positions = group_boxes[k]
                    self._save_debug_overlay(img, str(save_path))
            if failed:
                # log EVERY (name, error) pair with its traceback first:
                # chaining only failed[0] would hide a distinct root cause
                # when a flaky tunnel fails several fetches differently
                for n, err in failed:
                    self.logger.error(f"readback failed for {n}",
                                      exc_info=err)
                names = ", ".join(f"{n}: {e!r}" for n, e in failed)
                raise RuntimeError(
                    f"readback failed for [{names}]") from failed[0][1]

        def crop_bbox(mask_boxes, h, w):
            if not self.crop_readback:
                return None
            return compute_crop_bbox(mask_boxes, h, w)

        def dispatch_group(group):
            frames = [g[0] for g in group]
            masks = [g[1] for g in group]
            group_boxes = [g[2] for g in group]
            paths = [output_dir / g[3].name for g in group]
            if self.devices != 1:
                out = self._stylize_group_pod(frames, masks, group_boxes)
            elif len(group) == 1:
                u8, _, _ = self._stylize_device(frames[0], masks[0],
                                                boxes=group_boxes[0])
                out = u8[None]
            else:
                out, _ = self._stylize_group(frames, masks, group_boxes)
            cropwins = [g[6] for g in group]
            if cropwins[0] is not None:
                # upload-cropped group: the program already ran on the
                # window, so the whole (small) output ships and pastes at
                # each frame's own window origin. Debug overlays need the
                # tile boxes back in full-frame coordinates.
                crop = (cropwins, [g[4] for g in group])
                self._last_crop = cropwins[0]  # introspection/tests
                group_boxes = [
                    [(b[0] + cw[0], b[1] + cw[0], b[2] + cw[2], b[3] + cw[2])
                     for b in bx]
                    for bx, cw in zip(group_boxes, cropwins)]
            else:
                crop = None
                bbox = crop_bbox([g[5] for g in group],
                                 *frames[0].shape[:2])
                self._last_crop = bbox  # introspection/tests
                if bbox is not None:
                    y0, y1, x0, x1 = bbox
                    out = out[:, y0:y1, x0:x1]
                    crop = ([bbox] * len(group), [g[4] for g in group])
            # fetch PER FRAME, not per group: slicing the (F, h, w, 3)
            # output into F device arrays multiplies concurrent wire
            # streams (the tunnel multiplexes ~2x at 6 streams) and
            # restores 1-frame granularity at fpd>1 — measured 3.7x
            # streaming vs the whole-group fetch on a contended tunnel
            # (tools/profile_sliced_fetch.py, docs/perf/sliced_fetch_r3)
            slices = [out[k] for k in range(out.shape[0])]
            for s in slices:
                try:
                    s.copy_to_host_async()
                except Exception:
                    pass
            in_flight.append(([fetch_pool.submit(np.asarray, s)
                               for s in slices],
                              group_boxes, paths, crop))
            # window counted in FRAMES (the fetch unit), deep enough to
            # keep readback_streams transfers truly concurrent while the
            # device runs ahead — the measured configuration
            # (tools/profile_sliced_fetch.py, bench._submit_frames)
            while sum(len(g[0]) for g in in_flight) > \
                    self.readback_streams + 2 and len(in_flight) > 1:
                try:
                    drain_one()
                except Exception as e:
                    # a deferred device error belongs to the DRAINED group
                    # (already popped), not the group just dispatched
                    self.logger.error(f"Readback failed: {e}")

        group: List[Any] = []

        def flush_group():
            # hand off and CLEAR before dispatching: a failed dispatch
            # must drop its group, not poison every later one (per-file
            # resilience, generator.py:700)
            nonlocal group
            if not group:
                return
            g, group = group, []
            try:
                dispatch_group(g)
            except Exception as e:
                # a failed dispatch drops EVERY frame in the group —
                # name them all, not just the one that tripped it
                names = ", ".join(x[3].name for x in g)
                self.logger.error(
                    f"Dispatch failed; dropping group [{names}]: {e}")

        # frames-per-dispatch: co-batch frames so the pow2 tile bucket stays
        # full (tiling.frames_per_dispatch); 'auto' decides from frame 0
        fpd_cfg = self.cfg.get("inference", {}).get("frames_per_dispatch",
                                                    "auto")
        group_size = None if fpd_cfg == "auto" else max(1, int(fpd_cfg))
        if self.mode == "fullframe":
            group_size = 1  # fullframe is already one whole-frame pass
        if self.devices != 1:
            # pod streaming: frames shard over the mesh 'data' axis (no
            # cross-chip communication). Fullframe: one frame per chip.
            # Tiled: fpd frames per chip per dispatch, fpd decided from
            # frame 0 exactly like single-chip co-batching.
            self._ensure_mesh()
            if self.mode == "fullframe":
                group_size = self._mesh.devices.size
            else:
                group_size = None  # D * frames_per_dispatch, set below

        PREFETCH = 6  # bound decoded-frame memory to O(PREFETCH)
        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = {}
            for p in files[:PREFETCH]:
                futures[p] = pool.submit(load_one, p)
            for i, input_path in enumerate(
                    tqdm(files, desc="Processing images",
                         disable=not progress)):
                if i + PREFETCH < len(files):
                    nxt = files[i + PREFETCH]
                    futures[nxt] = pool.submit(load_one, nxt)
                try:
                    frame, mask, rgb_u8, mbox, boxes, cropwin = \
                        futures.pop(input_path).result()
                    eff_mask = mask if mask is not None else np.ones(
                        frame.shape[:2], np.float32)
                    if group_size is None:
                        fpd = frames_per_dispatch(
                            max(1, len(boxes)), target=self.max_tile_batch)
                        if fpd_cfg != "auto":
                            fpd = max(1, int(fpd_cfg))
                        if self.devices != 1:
                            self._pod_fpd = fpd
                            group_size = self._mesh.devices.size * fpd
                            self.logger.info(
                                f"Pod co-batching: {fpd} frames/chip x "
                                f"{self._mesh.devices.size} chips/dispatch "
                                f"(~{len(boxes)} tiles/frame)")
                        else:
                            group_size = fpd
                            self.logger.info(
                                f"Co-batching {group_size} frames/dispatch "
                                f"(~{len(boxes)} tiles/frame)")
                    # a co-batched dispatch needs every frame in the
                    # group at ONE shape: upload-cropped windows bucket to
                    # 128-multiples so a stable mask reuses one shape, but
                    # when the window (or a maskless frame) changes shape,
                    # flush the in-progress group first. Crop-ness must
                    # also match: dispatch_group treats the whole group as
                    # cropped iff its FIRST member is, so an upload-cropped
                    # window and an uncropped full frame of coincidentally
                    # equal dims must never share a group (the paste would
                    # use the wrong coordinate space).
                    if group and (group[0][0].shape != frame.shape
                                  or (group[0][6] is None)
                                  != (cropwin is None)):
                        flush_group()
                    group.append((frame, eff_mask, boxes, input_path,
                                  rgb_u8, mbox, cropwin))
                except Exception as e:
                    self.logger.error(
                        f"Failed to process {input_path.name}: {e}")
                    continue
                if len(group) >= group_size:
                    flush_group()
            flush_group()
            while in_flight:
                # deferred device errors surface at the tail fetch; drop
                # only the group whose fetch failed and keep draining the
                # rest (they are independent dispatches)
                try:
                    drain_one()
                except Exception as e:
                    self.logger.error(f"Tail drain failed for a group: {e}")
        fetch_pool.shutdown(wait=False)
        failed = writer.flush()
        writer.close()
        if failed:
            self.logger.error(f"{failed} frame writes failed")

    def _ensure_mesh(self) -> None:
        from patch_toon_tpu.parallel import make_mesh, replicate

        if self._mesh is None:
            # Multi-host runs build a LOCAL mesh: frames are partitioned
            # across hosts by file_shard (stateless per-frame work), so each
            # process drives only its own chips and no cross-host collective
            # program is ever compiled.
            local = (jax.local_devices() if jax.process_count() > 1
                     else None)
            self._mesh = make_mesh(
                data=self.devices if self.devices != 1 else -1,
                devices=local)
            self.logger.info(f"Pod inference mesh: {self._mesh}")
        if self._g_vars_sharded is None:
            # (re)replicate — _ensure_quant invalidates this when the
            # calibrated scales join g_vars
            self._g_vars_sharded = replicate(self.g_vars, self._mesh)

    def _stylize_group_pod(self, frames, masks, group_boxes):
        """Dispatch a frame group sharded over the mesh 'data' axis.

        Fullframe: one frame per chip. Tiled: consecutive chunks of
        ``self._pod_fpd`` frames per chip, each chip running the co-batched
        multiframe tile program on its chunk. Short final groups are padded
        by repeating the last frame; the caller only reads the real rows."""
        from patch_toon_tpu.infer.tiling import pack_boxes_multi
        from patch_toon_tpu.parallel import batch_sharding

        self._ensure_quant(frames[0])
        self._ensure_mesh()
        mesh = self._mesh
        sh = batch_sharding(mesh)
        D = mesh.devices.size
        n_real = len(frames)
        h, w, c = frames[0].shape

        if self.mode == "fullframe":
            frames = list(frames) + [frames[-1]] * (D - n_real)
            masks = list(masks) + [masks[-1]] * (D - n_real)
            key = ("pod_ff", D, h, w, c)
            if key not in self._frame_fns:
                self._frame_fns[key] = make_batched_fullframe_fn(
                    self.model.generator, h, w, c, self.dtype, mesh,
                    compiler_options=self.xla_options)
            with mesh:
                u8, _ = self._frame_fns[key](
                    self._g_vars_sharded,
                    jax.device_put(jnp.asarray(np.stack(frames)), sh),
                    jax.device_put(
                        jnp.asarray(self._mask_wire(np.stack(masks))), sh))
            return u8[:n_real]

        fpd = getattr(self, "_pod_fpd", 1)
        total = D * fpd
        frames = list(frames) + [frames[-1]] * (total - n_real)
        masks = list(masks) + [masks[-1]] * (total - n_real)
        group_boxes = list(group_boxes) + [group_boxes[-1]] * (total - n_real)
        chunks = [group_boxes[i * fpd:(i + 1) * fpd] for i in range(D)]
        bucket = bucket_size(
            max(1, max(sum(len(b) for b in ch) for ch in chunks)))

        def build_pod_pack():
            fb = np.zeros((D, bucket, 5), np.int32)
            wts = np.zeros((D, bucket, self.patch_size, self.patch_size),
                           np.float32)
            for i, ch in enumerate(chunks):
                fb[i], wts[i], _ = pack_boxes_multi(ch, self.patch_size,
                                                    bucket)
            return jax.device_put(fb, sh), jax.device_put(wts, sh)

        pkey = ("pod", tuple(tuple(tuple(b) for b in ch) for ch in chunks),
                bucket, D, fpd)
        hit = self._pack_cache.get(pkey)
        if hit is None:
            hit = build_pod_pack()
            if len(self._pack_cache) >= self._pack_cache_cap:
                self._pack_cache.pop(next(iter(self._pack_cache)))
            self._pack_cache[pkey] = hit
        fb_dev, wts_dev = hit
        key = ("podmf", D, fpd, h, w, c, bucket)
        if key not in self._frame_fns:
            self._frame_fns[key] = make_pod_multiframe_fn(
                self.model.generator, self.patch_size, bucket, fpd, h, w, c,
                self.dtype, mesh, compiler_options=self.xla_options)
        fr = np.stack(frames).reshape(D, fpd, h, w, c)
        mk = self._mask_wire(np.stack(masks).reshape(D, fpd, h, w))
        with mesh:
            u8, _ = self._frame_fns[key](
                self._g_vars_sharded,
                jax.device_put(jnp.asarray(fr), sh),
                fb_dev, wts_dev,
                jax.device_put(jnp.asarray(mk), sh))
        return u8.reshape(total, h, w, 3)[:n_real]

    def _stylize_group(self, frames, masks, group_boxes):
        """Dispatch a co-batched group through the multiframe tiled
        program; returns (u8 batch, composite float batch — the latter
        feeds multi-stream temporal chains)."""
        from patch_toon_tpu.infer.tiling import pack_boxes_multi

        self._ensure_quant(frames[0])
        f = len(frames)
        h, w, c = frames[0].shape
        total = sum(len(b) for b in group_boxes)
        bucket = bucket_size(max(1, total))
        fboxes, weights = self._packed_cached(
            ("group", tuple(tuple(map(tuple, b)) for b in group_boxes),
             bucket),
            lambda: pack_boxes_multi(group_boxes, self.patch_size,
                                     bucket)[:2])
        key = ("multi", f, h, w, c, bucket)
        if key not in self._frame_fns:
            self._frame_fns[key] = make_multiframe_fn(
                self.model.generator, self.patch_size, bucket, f, h, w, c,
                self.dtype, compiler_options=self.xla_options)
        # jnp.stack, not np.stack: frames may be device-resident already
        # (prefetch-thread upload) — np.stack would force a D2H round trip
        u8, out_float = self._frame_fns[key](
            self.g_vars, jnp.stack(frames),
            fboxes, weights,
            jnp.asarray(self._mask_wire(np.stack(masks))))
        return u8, out_float

    def _temporal_register(self, name: str) -> None:
        """Mark a frame as a member of the temporal stream (idempotent).

        Guarded by a (lazily created) RLock: the prefetch worker registers
        frames from load_aux while the main loop sorts the member set in
        _temporal_position — an unguarded add mid-``sorted()`` raises
        "set changed size during iteration" and drops the frame."""
        with self._temporal_lock():
            self._temporal_members.add(name)

    def _temporal_lock(self):
        # __init__ creates the lock eagerly; this lazy fallback (guarded by
        # a module-level lock so two threads can't each install a different
        # per-engine lock) only serves bare instances built without
        # __init__ in tests — the hot path never takes the global lock
        if not hasattr(self, "_temporal_members_lock"):
            with _TEMPORAL_LOCK_INIT:
                if not hasattr(self, "_temporal_members_lock"):
                    self._temporal_members_lock = threading.RLock()
                    self._temporal_members = set()
        return self._temporal_members_lock

    def _temporal_position(self, name: str) -> int:
        """Global stream position of a frame: its rank in the sorted set of
        known stream members.

        Flow files (``flow_bwd/{i}.npy``) are indexed by POSITION in the
        sorted frame stream (tools/optical_flow.py numbers by list index,
        whatever the frames are named) — NOT parsed from filenames, whose
        numbering may be 1-based (make_sample_scene) while positions are
        0-based. Rank-in-sorted-members (rather than a first-seen counter)
        makes the index (a) survive watch-service restarts over a partially
        stylized directory — watch_directory registers already-stylized
        frames from their outputs — (b) keep a given-up frame's slot for
        its retry, and (c) stay immune to TRANSIENT files: watch mode only
        registers a frame after its mtime settles, so a half-written file
        that is deleted again never occupies a position and can't shift
        every later frame onto the wrong flow (review r3). A member whose
        name sorts before an already-processed frame arriving late shifts
        only FUTURE positions — toward the true final-list index."""
        with self._temporal_lock():
            self._temporal_members.add(name)
            members = sorted(self._temporal_members)
        return members.index(name)

    def _process_directory_temporal(self, files, load_one, output_dir,
                                    writer, mask_dir=None,
                                    progress: bool = True) -> None:
        """Temporal-guide stylization: each frame's input gains channels
        holding the flow-warped previous *stylized* frame.

        guide_i = warp(stylized_{i-1}, flow_bwd[i]) where flow_bwd[i] is the
        i -> i-1 correspondence — read from flow_dir/{i}.npy (written by
        tools/optical_flow.py) with flow_source=files, or computed ON
        DEVICE (_temporal_device_flow: the same pyramidal-LK over PIL-exact
        grayscale the tool's backend="tpu" runs, against the previous
        frame's device-resident gray) with flow_source=device — no flow
        upload, no preprocessing pass. Frame 0 bootstraps with its own RGB.
        The previous output stays on device in [-1, 1]; only the uint8
        frame is fetched. The chain is inherently sequential (frame i
        depends on i-1), so device dispatches can't pipeline — but
        everything around them can: frame i+1's decode and flow .npy /
        flow-mask load run in a worker thread while the device stylizes
        frame i, and frame i's uint8 readback (the tunnel's 8-90 ms/frame)
        overlaps frame i+1's compute, since only the DEVICE-resident float
        output feeds the chain. Requires a checkpoint trained with the
        matching temporal channels (see tools/temporal_guide.py).
        """
        from concurrent.futures import ThreadPoolExecutor

        from PIL import Image
        from tqdm import tqdm

        flow_dir = Path(self.temporal_flow_dir) if self.temporal_flow_dir \
            else None
        device_flow = self.temporal_flow_source == "device"

        # Chain state lives on the engine so watch mode continues the warp
        # chain (and the global flow index) across polls; a fresh engine —
        # every one-shot CLI run — starts clean. Positions are keyed by
        # NAME so a watch-mode retry of a failed frame reuses its original
        # stream position instead of drifting every later frame's flow.
        def gi_of(path: Path) -> int:
            return self._temporal_position(path.name)

        def load_flow(i: int):
            if flow_dir is None:
                return None
            flow_path = flow_dir / (f"{self.temporal_format % i}.npy")
            if not flow_path.exists():
                return None
            flow = np.load(str(flow_path))
            if self.temporal_flow_f16 and flow.dtype != np.float16:
                flow = flow.astype(np.float16)  # halve the dominant H2D
            return flow

        def load_flow_mask(p: Path):
            """Raw flow mask with the TOOL's semantics (optical_flow.py
            _read_mask: PIL 'L', > 127 — distinct from the composite
            mask's > 128 dataset parity). Missing mask -> None (unmasked
            flow, like an all-true mask)."""
            if mask_dir is None:
                return None
            resolved = find_corresponding_image(str(mask_dir), p.name)
            if not os.path.exists(resolved):
                return None
            arr = np.asarray(Image.open(resolved).convert("L"))
            if self.mask_packed:
                # bit-packed wire form: 8x fewer bytes on the chain's
                # sequential critical path (_temporal_device_flow unpacks)
                return np.packbits(arr > 127)
            return (arr > 127).astype(np.uint8)

        def load_aux(p: Path):
            # per-frame sidecar riding the prefetch thread: the flow .npy
            # (files) or the raw flow mask (device)
            return load_flow_mask(p) if device_flow \
                else load_flow(gi_of(p))

        prev_float = getattr(self, "_temporal_prev", None)
        prev_gray = getattr(self, "_temporal_prev_gray", None)
        pending = None  # (band futures, save_path, boxes) being read back
        pool = ThreadPoolExecutor(max_workers=1)
        futures = {0: pool.submit(load_one, files[0])} if files else {}
        flow_futures = {0: pool.submit(load_aux, files[0])} \
            if files else {}
        # The chain is one frame at a time, so the group-level concurrent
        # drain can't apply — instead each frame's readback is split into
        # row bands fetched by concurrent threads (intra-frame slicing
        # measured ~1.3x a single stream; tools/profile_transport.py).
        # K=4 is the measured configuration for INTRA-frame banding (~1.3x
        # one stream; tools/profile_transport.py slice4 rows) — row bands
        # of one frame do not multiplex like independent whole-frame
        # fetches, and smaller bands pay more per-RPC overhead, so the
        # 6-stream whole-frame numbers do not transfer here
        K = max(1, min(4, self.readback_streams))
        fetch_pool = ThreadPoolExecutor(max_workers=K)

        def submit_fetch(u8):
            h = int(u8.shape[0])
            if K == 1 or h < 8 * K:
                bands = [u8]
            else:
                cuts = [h * j // K for j in range(K + 1)]
                bands = [u8[cuts[j]:cuts[j + 1]] for j in range(K)]
            for b in bands:
                try:
                    b.copy_to_host_async()
                except Exception:
                    pass
            return [fetch_pool.submit(np.asarray, b) for b in bands]

        def drain_pending():
            nonlocal pending
            if pending is None:
                return
            band_futs, save_path, boxes, crop = pending
            pending = None
            parts = [f.result() for f in band_futs]
            arr = parts[0] if len(parts) == 1 else np.concatenate(parts)
            if crop is not None:
                # crop_readback: only the mask-support bbox was fetched;
                # outside it the composite equals the input bytes exactly
                (y0, y1, x0, x1), rgb_u8 = crop
                img = rgb_u8.copy()
                img[y0:y1, x0:x1] = arr
            else:
                img = arr
            writer.submit(str(save_path), img)
            if self.debug_mode:
                self.patch_positions = boxes
                self._save_debug_overlay(img, str(save_path))

        for i, input_path in enumerate(tqdm(files, desc="Temporal frames",
                                            disable=not progress)):
            gi = gi_of(input_path)  # global stream position (flow files are
            #                         indexed by it, not the batch index)
            if i + 1 < len(files):
                futures[i + 1] = pool.submit(load_one, files[i + 1])
                flow_futures[i + 1] = pool.submit(load_aux, files[i + 1])
            try:
                # pop BOTH futures before any .result() so a failed decode
                # can't leak the (multi-MB) flow entry in flow_futures
                frame_f = futures.pop(i)
                flow_f = flow_futures.pop(i)
                frame, mask, rgb_u8, mbox, _boxes, _cw = frame_f.result()
                aux = flow_f.result()  # flow .npy | raw flow mask | None
                # one fused dispatch builds the generator input: on-device
                # normalization of the (possibly uint8) frame + warp of the
                # device-resident previous output + guide concat
                # (_temporal_prep; the chain is sequential, so every saved
                # eager round-trip comes straight off the critical path)
                fdev = jnp.asarray(frame)  # upload once, reuse below
                if device_flow:
                    if prev_float is not None and prev_gray is not None:
                        fmask = None if aux is None else jnp.asarray(aux)
                        flow_in, gray = _temporal_device_flow(
                            fdev, prev_gray, fmask,
                            self.temporal_flow_scale)
                        prev_in = prev_float
                    else:
                        gray = _device_gray(fdev)
                        prev_in, flow_in = None, None  # bootstrap
                elif prev_float is None or flow_dir is None:
                    prev_in, flow_in = None, None  # bootstrap: own RGB
                elif aux is not None:
                    prev_in, flow_in = prev_float, jnp.asarray(aux)
                else:
                    self.logger.warning(
                        f"No flow for frame {gi} "
                        f"({flow_dir / (self.temporal_format % gi)}.npy); "
                        f"using unwarped previous output")
                    prev_in, flow_in = prev_float, None
                full = _temporal_prep(fdev, prev_in, flow_in,
                                      self.temporal_depth)
                # reuse the tile boxes the prefetch thread already walked
                # (load_one) instead of re-running the nonzero scan on the
                # sequential chain's critical path
                u8, out_float, boxes = self._stylize_device(
                    full, mask, boxes=_boxes)
                prev_float = out_float
                if device_flow:
                    prev_gray = gray
                # crop the D2H fetch to the mask-support bbox (the chain
                # state prev_float stays FULL-frame on device, so the warp
                # chain is untouched; only the host readback shrinks)
                crop = None
                if self.crop_readback:
                    bbox = compute_crop_bbox(
                        [mbox], *np.shape(frame)[:2])
                    self._last_crop = bbox
                    if bbox is not None:
                        y0, y1, x0, x1 = bbox
                        u8 = u8[y0:y1, x0:x1]
                        crop = (bbox, rgb_u8)
                band_futs = submit_fetch(u8)
                try:
                    # PREVIOUS frame's readback, overlapped with this
                    # frame's compute. A deferred error here belongs to
                    # that frame — this frame's output and the warp chain
                    # are intact, so don't drop them or restart the chain
                    drain_pending()
                except Exception as e:
                    self.logger.error(
                        f"Readback failed for the previous frame: {e}")
                pending = (band_futs, output_dir / input_path.name, boxes,
                           crop)
            except Exception as e:
                self.logger.error(f"Failed to process {input_path.name}: {e}")
                prev_float = None  # restart the temporal chain
                prev_gray = None
                continue
        try:
            drain_pending()
        except Exception as e:
            self.logger.error(f"Readback failed for the last frame: {e}")
        self._temporal_prev = prev_float
        self._temporal_prev_gray = prev_gray
        pool.shutdown(wait=False)
        fetch_pool.shutdown(wait=False)

    def _detect_streams(self, input_dir: Path) -> List[str]:
        """Subdirectory-per-video layout for multi-stream temporal serving:
        input_dir holds no images itself but >= 1 subdirectory that does."""
        if _image_files(input_dir):
            return []
        try:
            subdirs = list(input_dir.iterdir())
        except (FileNotFoundError, NotADirectoryError):
            return []  # input dir removed mid-watch: go quiet, don't crash
        return sorted(
            d.name for d in subdirs if d.is_dir() and _image_files(d))

    def _ms_info(self, name: str, files, mask_dir: Path, flow_root):
        """Per-stream serving state: the file queue, per-stream aux dirs,
        the warp-chain carry (prev stylized output / prev grayscale), and
        the set of known stream members. Files-mode flows are indexed by a
        frame's RANK in the sorted member set — the multi-stream form of
        _temporal_position, so watch retries/restarts keep positions."""
        chans = {n: dict(c, path=str(Path(c["path"]) / name))
                 for n, c in self.additional_channels.items()}
        mdir = mask_dir / name
        masked = not mask_dir.name.endswith("ignore")
        if masked and not mdir.exists():
            raise FileNotFoundError(f"Mask directory not found: {mdir}")
        return dict(name=name, files=list(files), chans=chans, mdir=mdir,
                    masked=masked,
                    fdir=(flow_root / name) if flow_root else None,
                    prev=None, prev_gray=None, idx=0,
                    members={p.name for p in files})

    def _ms_load_frame(self, info, i: int):
        """Decode one stream frame + its mask/aux (worker-thread side).

        The aux slot carries the mode's wire payload: the raw (>127) flow
        mask for flow_source=device (bit-packed when mask_upload=packed),
        or the flow_dir/<stream>/{pos}.npy field for files mode, resolved
        by the frame's member rank — equal to its sorted-list index in a
        one-shot run, and stable across watch polls and retries."""
        from PIL import Image

        p = info["files"][i]
        frame, rgb_u8 = self._load_frame(
            str(p), with_rgb_u8=True, channels=info["chans"])
        mask = None
        if info["masked"]:
            mask = self._load_eroded_mask(
                str(info["mdir"] / p.name), frame.shape[:2])
        mbox = mask_support_bbox(mask) if mask is not None else None
        aux = None
        if self.temporal_flow_source == "device":
            # raw flow mask, the TOOL's semantics (> 127); missing ->
            # unmasked flow — mirrors the single-stream load_flow_mask
            resolved = find_corresponding_image(str(info["mdir"]), p.name)
            if os.path.exists(resolved):
                arr = np.asarray(Image.open(resolved).convert("L"))
                aux = np.packbits(arr > 127) if self.mask_packed \
                    else (arr > 127).astype(np.uint8)
        elif info["fdir"] is not None:
            pos = sorted(info["members"]).index(p.name)
            fp = info["fdir"] / f"{self.temporal_format % pos}.npy"
            if fp.exists():
                aux = np.load(str(fp))
                if self.temporal_flow_f16 and aux.dtype != np.float16:
                    aux = aux.astype(np.float16)
        # tile layout on the worker thread too — the nonzero walk is pure
        # host work that has no place on the sequential cycle thread
        eff = mask if mask is not None else np.ones(frame.shape[:2],
                                                    np.float32)
        boxes = tile_boxes_from_mask(eff, self.patch_size,
                                     self.overlap_percent)
        return frame, mask, rgb_u8, mbox, aux, p.name, eff, boxes

    def _ms_run_cycles(self, infos, writer, load_pool, fetch_pool,
                       output_dir: Path, shape_ref,
                       progress: bool = True) -> None:
        """Drain every stream's file queue as interleaved chain cycles.

        Each cycle takes the next frame from every live stream, runs the
        per-stream temporal prologue (on-device flow + fused warp/concat —
        exactly the single-stream dispatches), then stylizes ALL streams'
        frames in ONE co-batched multiframe dispatch while every stream's
        uint8 readback drains concurrently over the fetch pool. Chains
        never mix: stream k's guide warps stream k's own previous output.
        Chain state (prev/prev_gray) lives on the info dicts, so a caller
        that keeps them (_watch_multistream) carries chains across calls;
        shape_ref pins the one compiled resolution the same way. All
        pending readbacks are drained before returning."""
        from tqdm import tqdm

        device_flow = self.temporal_flow_source == "device"
        pending = []  # (fetch future, save path, crop, boxes)

        def drain_one():
            fut, save_path, crop, boxes = pending.pop(0)
            try:
                arr = fut.result()
            except Exception as e:
                self.logger.error(f"Readback failed for "
                                  f"{Path(save_path).name}: {e}")
                return
            if crop is not None:
                (y0, y1, x0, x1), rgb_u8 = crop
                img = rgb_u8.copy()
                img[y0:y1, x0:x1] = arr
            else:
                img = arr
            writer.submit(str(save_path), img)
            if self.debug_mode:
                self.patch_positions = boxes
                self._save_debug_overlay(img, str(save_path))

        total = sum(len(i["files"]) - i["idx"] for i in infos)
        bar = tqdm(total=total, desc="Temporal frames (multi-stream)",
                   disable=not progress)

        def submit_loads():
            return [(info,
                     load_pool.submit(self._ms_load_frame, info,
                                      info["idx"]))
                    for info in infos if info["idx"] < len(info["files"])]

        subs = submit_loads()
        while subs:
            for info, _ in subs:
                info["idx"] += 1
            next_subs = submit_loads()  # next cycle rides the load pool
            batch = []
            for info, fut in subs:
                try:
                    (frame, mask, rgb_u8, mbox, aux, fname, eff,
                     boxes) = fut.result()
                    if shape_ref[0] is None:
                        shape_ref[0] = frame.shape
                    elif frame.shape != shape_ref[0]:
                        raise ValueError(
                            f"stream {info['name']} is "
                            f"{frame.shape[:2]}, others "
                            f"{shape_ref[0][:2]} — all streams must share "
                            "one resolution")
                    fdev = jnp.asarray(frame)
                    if device_flow:
                        if info["prev"] is not None and \
                                info["prev_gray"] is not None:
                            fmask = None if aux is None else \
                                jnp.asarray(aux)
                            flow_in, gray = _temporal_device_flow(
                                fdev, info["prev_gray"], fmask,
                                self.temporal_flow_scale)
                            prev_in = info["prev"]
                        else:
                            gray = _device_gray(fdev)
                            prev_in, flow_in = None, None  # bootstrap
                    else:
                        gray = None
                        if info["prev"] is None or info["fdir"] is None:
                            prev_in, flow_in = None, None
                        elif aux is not None:
                            prev_in, flow_in = info["prev"], \
                                jnp.asarray(aux)
                        else:
                            self.logger.warning(
                                f"No flow for {info['name']}/{fname}; "
                                f"using unwarped previous output")
                            prev_in, flow_in = info["prev"], None
                    full = _temporal_prep(fdev, prev_in, flow_in,
                                          self.temporal_depth)
                    batch.append((info, full, eff, boxes, rgb_u8, mbox,
                                  gray, fname))
                except Exception as e:
                    self.logger.error(
                        f"Failed to process {info['name']} frame: {e}")
                    info["prev"] = info["prev_gray"] = None  # restart
            if batch:
                if len(batch) == 1:
                    _i, full, eff, boxes, *_ = batch[0]
                    u8b, outf, _ = self._stylize_device(full, eff,
                                                        boxes=boxes)
                    u8s, outs = [u8b], [outf]
                else:
                    u8b, outb = self._stylize_group(
                        [b[1] for b in batch], [b[2] for b in batch],
                        [b[3] for b in batch])
                    u8s = [u8b[k] for k in range(len(batch))]
                    outs = [outb[k] for k in range(len(batch))]
                for k, (info, full, eff, boxes, rgb_u8, mbox, gray,
                        fname) in enumerate(batch):
                    info["prev"] = outs[k]
                    if device_flow:
                        info["prev_gray"] = gray
                    u8 = u8s[k]
                    crop = None
                    if self.crop_readback and mbox is not None:
                        bbox = compute_crop_bbox([mbox],
                                                 *shape_ref[0][:2])
                        if bbox is not None:
                            y0, y1, x0, x1 = bbox
                            u8 = u8[y0:y1, x0:x1]
                            crop = (bbox, rgb_u8)
                    try:
                        u8.copy_to_host_async()
                    except Exception:
                        pass
                    pending.append((
                        fetch_pool.submit(np.asarray, u8),
                        output_dir / info["name"] / fname, crop, boxes))
                    bar.update(1)
                # keep enough fetches in flight to multiplex the wire,
                # drain the rest so memory stays bounded
                while len(pending) > self.readback_streams + len(infos):
                    drain_one()
            subs = next_subs
        while pending:
            drain_one()
        bar.close()

    def _process_multistream(self, streams, input_dir: Path,
                             mask_dir: Path, output_dir: Path,
                             progress: bool = True) -> None:
        """Serve N independent videos (one subdirectory each) as
        interleaved temporal chains on ONE chip.

        A single warp chain is inherently sequential — frame i needs frame
        i-1's stylized output — so one stream can't co-batch its own frames
        (the 512p tile bucket runs 170/256 = 66% full) and its readback
        gaps leave the wire idle. N streams break both limits: see
        _ms_run_cycles (byte-parity vs N separate single-stream runs:
        tests/test_temporal.py::test_multistream_*).

        Layout: paths.input_dir/<stream>/*.png, masks at
        paths.mask_dir/<stream>/, guide channels at <channel.path>/
        <stream>/, flows (flow_source=files) at temporal.flow_dir/
        <stream>/; outputs land in paths.output_dir/<stream>/. All streams
        must share one resolution (one compiled program serves every
        cycle). Multi-host runs shard whole STREAMS round-robin per
        process (chains are per-stream state, so hosts need no
        communication). Watch mode serves the same layout via
        _watch_multistream."""
        from concurrent.futures import ThreadPoolExecutor

        from patch_toon_tpu.native import FrameWriter

        if self.devices != 1:
            raise ValueError(
                "multi-stream temporal serving is per-chip (inference."
                "devices=1); run one process per chip and shard streams")
        if jax.process_count() > 1:
            streams = streams[jax.process_index()::jax.process_count()]
            self.logger.info(
                f"Multi-host: this process serves streams {streams}")
        flow_root = Path(self.temporal_flow_dir) \
            if self.temporal_flow_dir else None

        infos = []
        for s in streams:
            files = _image_files(input_dir / s)
            infos.append(self._ms_info(s, files, mask_dir, flow_root))
            (output_dir / s).mkdir(parents=True, exist_ok=True)
        total = sum(len(i["files"]) for i in infos)
        self.logger.info(
            f"Multi-stream temporal serving: {len(infos)} streams, "
            f"{total} frames, co-batched {len(infos)} frames/dispatch")

        writer = FrameWriter(num_threads=2)
        load_pool = ThreadPoolExecutor(max_workers=2)
        fetch_pool = ThreadPoolExecutor(
            max_workers=max(4, min(8, self.readback_streams)))
        try:
            self._ms_run_cycles(infos, writer, load_pool, fetch_pool,
                                output_dir, [None], progress=progress)
        finally:
            load_pool.shutdown(wait=False)
            fetch_pool.shutdown(wait=False)
            failed = writer.flush()
            writer.close()
            if failed:
                self.logger.error(f"{failed} frame writes failed")

    def _watch_multistream(self, wcfg) -> None:
        """Watch-serve N videos (paths.input_dir/<stream>/*.png) as
        persistent interleaved temporal chains on one chip.

        The multi-stream analogue of watch_directory (no reference
        equivalent — generator.py is one-shot): each poll picks up settled
        new frames per stream IN ORDER — a frame whose mask/guide channels
        haven't landed blocks its OWN stream (chains advance sequentially)
        but never the others — then every stream's new frames run through
        the co-batched cycle runner. Chain state, stream flow positions,
        the compiled-resolution pin and warm programs persist across
        polls; new stream subdirectories join live (once their mask dir
        exists, when masks are required). Multi-host runs shard whole
        streams by a stable name hash. Frames already stylized at start
        keep their stream positions (their outputs register them), so a
        service restart over a half-served directory resumes every
        chain's flow indexing correctly — the chain itself restarts from
        the first new frame's RGB bootstrap, exactly like single-stream
        watch."""
        import time as _time
        import zlib
        from concurrent.futures import ThreadPoolExecutor

        from patch_toon_tpu.native import FrameWriter

        if self.devices != 1:
            raise ValueError(
                "multi-stream temporal serving is per-chip (inference."
                "devices=1); run one process per chip and shard streams")
        poll = float(wcfg.get("poll_seconds", 1.0))
        idle_timeout = float(wcfg.get("idle_timeout_seconds") or 0)
        max_attempts = int(wcfg.get("max_attempts", 3))
        aux_warn_after = float(wcfg.get("aux_warn_seconds", 30.0))
        input_dir = Path(self.cfg.paths.input_dir)
        output_dir = Path(self.cfg.paths.output_dir)
        mask_dir = Path(self.cfg.paths.mask_dir)
        mask_needed = not mask_dir.name.endswith("ignore")
        flow_root = Path(self.temporal_flow_dir) \
            if self.temporal_flow_dir else None
        nproc, me = jax.process_count(), jax.process_index()

        writer = FrameWriter(num_threads=2)
        load_pool = ThreadPoolExecutor(max_workers=2)
        fetch_pool = ThreadPoolExecutor(
            max_workers=max(4, min(8, self.readback_streams)))
        shape_ref = [None]
        infos: Dict[str, dict] = {}
        done: Dict[str, set] = {}
        attempts: Dict[str, int] = {}
        waiting_since: Dict[str, float] = {}
        aux_warned: set = set()

        def aux_ready(info, p: Path) -> bool:
            if info["masked"] and not os.path.exists(
                    find_corresponding_image(str(info["mdir"]), p.name)):
                return False
            for ccfg in info["chans"].values():
                if not os.path.exists(
                        find_corresponding_image(ccfg["path"], str(p))):
                    return False
            return True

        idle = 0.0
        self.logger.info(
            f"Watching {input_dir} (multi-stream temporal, poll {poll}s, "
            f"idle timeout {idle_timeout or 'none'})")
        try:
            while True:
                now = _time.time()
                for s in self._detect_streams(input_dir):
                    if s in infos or (nproc > 1 and
                                      zlib.crc32(s.encode()) % nproc != me):
                        continue
                    if mask_needed and not (mask_dir / s).exists():
                        continue  # producer hasn't created it yet
                    info = self._ms_info(s, [], mask_dir, flow_root)
                    (output_dir / s).mkdir(parents=True, exist_ok=True)
                    prior = {q.name for q in
                             _image_files(output_dir / s)}
                    info["members"] |= prior  # keep restart positions
                    done[s] = set(prior)
                    infos[s] = info
                    self.logger.info(
                        f"Stream {s}: serving" + (
                            f" ({len(prior)} already stylized)"
                            if prior else ""))
                new_total = 0
                for s, info in infos.items():
                    fresh = []
                    for p in _image_files(input_dir / s):
                        if p.name in done[s] \
                                or (output_dir / s / p.name).exists():
                            info["members"].add(p.name)
                            done[s].add(p.name)
                            continue
                        key = f"{s}/{p.name}"
                        try:
                            if p.stat().st_mtime > now - max(0.25,
                                                             poll / 2):
                                break  # settling: chain order, stream waits
                        except OSError:
                            break
                        info["members"].add(p.name)
                        if not aux_ready(info, p):
                            first = waiting_since.setdefault(key, now)
                            if key not in aux_warned \
                                    and now - first >= aux_warn_after:
                                aux_warned.add(key)
                                self.logger.warning(
                                    f"{key}: mask/guide channels still "
                                    f"missing after {now - first:.0f}s; "
                                    "its stream stays blocked until they "
                                    "arrive")
                            break  # chain order: only THIS stream blocks
                        waiting_since.pop(key, None)
                        aux_warned.discard(key)
                        fresh.append(p)
                    info["files"] = fresh
                    info["idx"] = 0
                    new_total += len(fresh)
                if new_total:
                    try:
                        self._ms_run_cycles(
                            list(infos.values()), writer, load_pool,
                            fetch_pool, output_dir, shape_ref,
                            progress=False)
                    except Exception as e:
                        # the service must outlive a bad batch; per-frame
                        # attempts below decide retry vs give-up
                        self.logger.error(f"Batch failed: {e}")
                    writer.flush()
                    for s, info in infos.items():
                        for p in info["files"]:
                            key = f"{s}/{p.name}"
                            if (output_dir / s / p.name).exists():
                                done[s].add(p.name)
                                idle = 0.0
                            else:
                                attempts[key] = attempts.get(key, 0) + 1
                                if attempts[key] >= max_attempts:
                                    self.logger.error(
                                        f"Giving up on {key} after "
                                        f"{max_attempts} attempts")
                                    done[s].add(p.name)
                    self.logger.info(
                        f"Stylized {new_total} new frame(s) across "
                        f"{len(infos)} stream(s)")
                _time.sleep(poll)
                idle += poll
                if idle_timeout and idle >= idle_timeout:
                    self.logger.info(
                        f"No new frames for {idle:.0f}s; stopping watch")
                    return
        finally:
            load_pool.shutdown(wait=False)
            fetch_pool.shutdown(wait=False)
            failed = writer.flush()
            writer.close()
            if failed:
                self.logger.error(f"{failed} frame writes failed")
