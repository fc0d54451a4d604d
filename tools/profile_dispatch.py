#!/usr/bin/env python
"""Dispatch-difference profiling: time T(2N calls) - T(N calls) of the real
jitted programs, pipelined through the async dispatch queue. No loop-feedback
tricks — each dispatch executes the full program; the final fetch syncs.

Usage: python tools/profile_dispatch.py [N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.infer.engine import make_frame_fn
from patch_toon_tpu.infer.tiling import bucket_size, pack_boxes, tile_boxes_from_mask
from patch_toon_tpu.models import GeneratorJ

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
H, W, C, PS = 512, 910, 6, 80
DT = jnp.bfloat16


def timed_dispatch(fn, args_list, n):
    """Queue n dispatches (cycling inputs), fetch the last output fully."""
    out = None
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:8]
    return time.perf_counter() - t0


def measure(name, fn, args_list):
    # warm/compile
    np.asarray(jax.tree.leaves(fn(*args_list[0]))[0]).ravel()[:8]
    t1 = timed_dispatch(fn, args_list, N)
    t2 = timed_dispatch(fn, args_list, 2 * N)
    dt = (t2 - t1) / N
    print(f"{name:26s} {dt * 1e3:8.2f} ms/call")
    return dt


def main():
    gen = GeneratorJ(input_channels=C, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64), dtype=DT)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))
    mask = np.ones((H, W), np.float32)
    boxes = tile_boxes_from_mask(mask, PS, 30.0)
    bucket = bucket_size(len(boxes))
    bx, wts, _ = pack_boxes(boxes, PS, bucket)
    print(f"{len(boxes)} tiles -> bucket {bucket}, N={N}")

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, C), np.float32) * 2 - 1)
              for _ in range(3)]
    bx_j, wts_j = jnp.asarray(bx), jnp.asarray(wts)
    mask_j = jnp.asarray(mask)[..., None]
    tile_sets = [jnp.asarray(rng.random((bucket, PS, PS, C), np.float32)
                             * 2 - 1, DT) for _ in range(3)]

    # 1. generator alone on a tile bucket
    gen_fn = jax.jit(lambda t: gen.apply(g_vars, t, train=False))
    t_gen = measure("generator (bucket)", gen_fn, [(t,) for t in tile_sets])
    print(f"{'':26s} -> {t_gen * 1e6 / bucket:6.1f} us/tile x {bucket}")

    # 2. generator returning a reduced scalar (layout-pressure-free epilogue)
    gen_mean = jax.jit(
        lambda t: jnp.mean(gen.apply(g_vars, t, train=False)
                           .astype(jnp.float32)))
    measure("generator -> mean", gen_mean, [(t,) for t in tile_sets])

    # 3. full frame program (gather + gen + scan blend + composite)
    frame_fn = make_frame_fn(gen, PS, bucket, H, W, C, DT)
    t_frame = measure(
        "frame program (tiled)", lambda f: frame_fn(g_vars, f, bx_j, wts_j,
                                                    mask_j),
        [(f,) for f in frames])
    print(f"{'':26s} -> {1 / t_frame:6.1f} fps compute-only")

    # 4. smaller bucket sweep (padding sensitivity)
    for b in (128, 192, 256, 512):
        sets = [jnp.asarray(rng.random((b, PS, PS, C), np.float32) * 2 - 1,
                            DT) for _ in range(3)]
        tb = measure(f"generator bucket={b}", gen_fn, [(t,) for t in sets])
        print(f"{'':26s} -> {tb * 1e6 / b:6.1f} us/tile")


if __name__ == "__main__":
    main()
