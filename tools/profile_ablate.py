#!/usr/bin/env python
"""Ablation profile of the tiled frame program: replace one stage at a time.

  full        gather -> generator -> scan-blend -> composite
  no_blend    scan-blend replaced by a mean over tiles (compute kept)
  no_gen      generator replaced by tiles[...,:3] (blend kept)
  no_gather   tiles fed directly (gen + blend kept)

Usage: python tools/profile_ablate.py [iters]
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

from patch_toon_tpu.infer.tiling import bucket_size, pack_boxes, tile_boxes_from_mask
from patch_toon_tpu.models import GeneratorJ

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H, W, C, PS = 512, 910, 6, 80
DT = jnp.bfloat16


def build(variant, gen, g_vars, bucket):
    def fn(frame, bx, wts, mask):
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

        if variant == "no_gather":
            tiles = jnp.broadcast_to(frame[:PS, :PS, :], (bucket, PS, PS, C))
            # make tiles depend on bx so nothing is hoisted
            tiles = tiles + (bx[:, :1, None, None] % 2).astype(frame.dtype) * 0
        else:
            tiles = jax.vmap(g)(bx)

        if variant == "no_gen":
            gtiles = tiles[..., :3].astype(jnp.float32) * 0.9
        else:
            gtiles = gen.apply(g_vars, tiles.astype(DT),
                               train=False).astype(jnp.float32)

        if variant == "no_blend":
            out = jnp.mean(gtiles, axis=0)
            out = jax.image.resize(out, (H, W, 3), "nearest")
        else:
            canvas = jnp.zeros((H + PS, W + PS, 3), jnp.float32)
            wcanvas = jnp.zeros((H + PS, W + PS, 1), jnp.float32)

            def body(carry, inp):
                cv_, wv_ = carry
                tile, weight, box = inp
                y0, x0 = box[0], box[2]
                contrib = tile * weight[..., None]
                cur = jax.lax.dynamic_slice(cv_, (y0, x0, 0), (PS, PS, 3))
                cv_ = jax.lax.dynamic_update_slice(cv_, cur + contrib,
                                                   (y0, x0, 0))
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

    return fn


def two_point(fn, frame, args):
    @partial(jax.jit, static_argnums=1)
    def loop(a, n):
        def body(i, a):
            out = fn(a, *args)
            s = jnp.mean(out.astype(jnp.float32))
            return jnp.maximum(a, (s * 1e-5 - 10.0).astype(a.dtype))
        return jax.lax.fori_loop(0, n, body, a)

    np.asarray(loop(frame, ITERS)).ravel()[:1]
    t0 = time.perf_counter()
    np.asarray(loop(frame, ITERS)).ravel()[:1]
    t1 = time.perf_counter() - t0
    np.asarray(loop(frame, 3 * ITERS)).ravel()[:1]
    t0 = time.perf_counter()
    np.asarray(loop(frame, 3 * ITERS)).ravel()[:1]
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (2 * ITERS)


def main():
    gen = GeneratorJ(input_channels=C, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64), dtype=DT)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))
    mask = np.ones((H, W), np.float32)
    boxes = tile_boxes_from_mask(mask, PS, 30.0)
    bucket = bucket_size(len(boxes))
    bx, wts, _ = pack_boxes(boxes, PS, bucket)
    print(f"{len(boxes)} tiles -> bucket {bucket}")

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((H, W, C), np.float32) * 2 - 1)
    args = (jnp.asarray(bx), jnp.asarray(wts), jnp.asarray(mask)[..., None])

    base = None
    for variant in ("full", "no_blend", "no_gen", "no_gather"):
        fn = build(variant, gen, g_vars, bucket)
        dt = two_point(fn, frame, args)
        note = ""
        if variant == "full":
            base = dt
        else:
            note = f"  (stage cost ~{(base - dt) * 1e3:.2f} ms)"
        print(f"{variant:10s} {dt * 1e3:7.2f} ms/frame{note}")
    print(f"fps compute-only (full): {1 / base:.1f}")


if __name__ == "__main__":
    main()
