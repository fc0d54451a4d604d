#!/usr/bin/env python
"""Stage-level profile of the tiled inference program on TPU.

Times, with the two-point (fixed-cost-cancelling) method:
  gather   — vmapped dynamic_slice tile extraction
  gen      — generator forward on the tile bucket
  blend    — lax.scan scatter-accumulate + normalize + composite + uint8
  frame    — the full jitted frame program (all of the above)

Usage: python tools/profile_pipeline.py [iters]
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.infer.engine import make_frame_fn
from patch_toon_tpu.infer.tiling import bucket_size, pack_boxes, tile_boxes_from_mask
from patch_toon_tpu.models import GeneratorJ

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
H, W, C, PS = 512, 910, 6, 80
DT = jnp.bfloat16


def two_point(fn, args, iters=ITERS):
    """Time fn(args) via chained loop difference; fn must return an array
    whose mean feeds back nonlinearly into the first arg."""

    @partial(jax.jit, static_argnums=1)
    def loop(a, n):
        def body(i, a):
            out = fn(a, *args[1:])
            s = jnp.mean(out[0].astype(jnp.float32) if isinstance(out, tuple)
                         else out.astype(jnp.float32))
            return jnp.maximum(a, (s * 1e-3 - 10.0).astype(a.dtype))
        return jax.lax.fori_loop(0, n, body, a)

    a0 = args[0]
    np.asarray(jax.tree.leaves(loop(a0, ITERS))[0]).ravel()[:1]
    t1 = time.perf_counter()
    np.asarray(jax.tree.leaves(loop(a0, ITERS))[0]).ravel()[:1]
    t1 = time.perf_counter() - t1
    np.asarray(jax.tree.leaves(loop(a0, 3 * ITERS))[0]).ravel()[:1]
    t2 = time.perf_counter()
    np.asarray(jax.tree.leaves(loop(a0, 3 * ITERS))[0]).ravel()[:1]
    t2 = time.perf_counter() - t2
    return (t2 - t1) / (2 * ITERS)


def main():
    gen = GeneratorJ(input_channels=C, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64), dtype=DT)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))

    mask = np.ones((H, W), np.float32)
    boxes = tile_boxes_from_mask(mask, PS, 30.0)
    bucket = bucket_size(len(boxes))
    bx, wts, n = pack_boxes(boxes, PS, bucket)
    print(f"{len(boxes)} tiles -> bucket {bucket}")

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((H, W, C), np.float32) * 2 - 1)
    bx_j, wts_j = jnp.asarray(bx), jnp.asarray(wts)
    mask_j = jnp.asarray(mask)[..., None]
    tiles = jnp.asarray(rng.random((bucket, PS, PS, C), np.float32) * 2 - 1,
                        DT)
    gtiles = jnp.asarray(rng.random((bucket, PS, PS, 3), np.float32) * 2 - 1)

    # --- stage fns ---------------------------------------------------------
    def gather_fn(frame, bx):
        fpad = jnp.pad(frame, ((PS, PS), (PS, PS), (0, 0)))

        def g(box):
            y0, y1, x0, x1 = box[0], box[1], box[2], box[3]
            ph, pw = y1 - y0, x1 - x0
            hoff, woff = (PS - ph) // 2, (PS - pw) // 2
            tile = jax.lax.dynamic_slice(
                fpad, (PS + y0 - hoff, PS + x0 - woff, 0), (PS, PS, C))
            r = jnp.arange(PS)
            rv = (r >= hoff) & (r < hoff + ph)
            cv = (r >= woff) & (r < woff + pw)
            return tile * rv[:, None, None] * cv[None, :, None]

        return jax.vmap(g)(bx)

    def gen_fn(tiles):
        return gen.apply(g_vars, tiles, train=False)

    def blend_fn(gtiles, wts, bx, frame, mask):
        canvas = jnp.zeros((H + PS, W + PS, 3), jnp.float32)
        wcanvas = jnp.zeros((H + PS, W + PS, 1), jnp.float32)

        def body(carry, inp):
            cv_, wv_ = carry
            tile, weight, box = inp
            y0, x0 = box[0], box[2]
            contrib = tile * weight[..., None]
            cur = jax.lax.dynamic_slice(cv_, (y0, x0, 0), (PS, PS, 3))
            cv_ = jax.lax.dynamic_update_slice(cv_, cur + contrib, (y0, x0, 0))
            curw = jax.lax.dynamic_slice(wv_, (y0, x0, 0), (PS, PS, 1))
            wv_ = jax.lax.dynamic_update_slice(
                wv_, curw + weight[..., None], (y0, x0, 0))
            return (cv_, wv_), None

        (canvas, wcanvas), _ = jax.lax.scan(body, (canvas, wcanvas),
                                            (gtiles, wts, bx))
        out = canvas[:H, :W] / jnp.where(wcanvas[:H, :W] > 1e-8,
                                         wcanvas[:H, :W], 1.0)
        rgb = frame[:, :, :3]
        out = jnp.clip(rgb * (1 - mask) + out * mask, -1, 1)
        return jnp.round(jnp.clip((out + 1) * 127.5, 0, 255)).astype(jnp.uint8)

    frame_fn = make_frame_fn(gen, PS, bucket, H, W, C, DT)

    t_gather = two_point(gather_fn, (frame, bx_j))
    print(f"gather: {t_gather * 1e3:7.2f} ms/frame")
    t_gen = two_point(gen_fn, (tiles,))
    print(f"gen:    {t_gen * 1e3:7.2f} ms/frame "
          f"({t_gen * 1e6 / bucket:.1f} us/tile x {bucket})")
    t_blend = two_point(blend_fn, (gtiles, wts_j, bx_j, frame, mask_j))
    print(f"blend:  {t_blend * 1e3:7.2f} ms/frame "
          f"({t_blend * 1e6 / bucket:.1f} us/tile)")
    t_frame = two_point(
        lambda frame, *a: frame_fn(g_vars, frame, *a)[0].astype(jnp.float32),
        (frame, bx_j, wts_j, mask_j))
    print(f"frame:  {t_frame * 1e3:7.2f} ms/frame "
          f"-> {1.0 / t_frame:.1f} fps compute-only")


if __name__ == "__main__":
    main()
