"""Compiled inference program builders (single-chip, co-batched, pod).

Split out of ``infer.engine`` (r4, VERDICT r3 #3). Each ``make_*`` builds
ONE jitted XLA program for a fixed (frame-size, tile-bucket) signature:
tile gather via vmapped dynamic_slice, the generator over the whole tile
batch on the MXU, Gaussian-window scatter-accumulate blend, composite and
uint8 tail. Reference semantics anchors are cited per builder;
``engine`` re-exports every name.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from patch_toon_tpu.infer.common import (
    _composite_u8,
    _from_gather_repr,
    _gather_repr,
    _mask_f32,
    _to_signed_unit,
)

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
