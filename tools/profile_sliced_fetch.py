#!/usr/bin/env python
"""Does per-frame (or per-band) slicing of the fpd=3 multiframe output
raise tiled STREAMING throughput?

Motivation (r3 bench validation): fpd1 streaming ~18 fps is pinned well
below both its compute rate (27.8) and the 6-stream transport cap (~26) —
dispatch RPCs and fetch RPCs contend on the tunnel. fpd3 has 1.8x the
compute rate (49.9) but loses at whole-group granularity (one 4.2 MB
fetch: 17.3). Slicing the (3, H, W, 3) output into per-frame (or
per-band) device arrays before fetching restores fine granularity AND
multiplies concurrent streams, while keeping fpd3's compute advantage.

Each variant times the bench's exact streaming window (6 fetch workers,
<=8 dispatches in flight, best-of-3) on the shipped default model.

Usage: python tools/profile_sliced_fetch.py [--frames 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--sweep-workers", type=str, default=None,
                    help="comma list of fetch-pool sizes; runs ONLY the "
                         "fpd3 per-frame variant at each size (one compile)")
    ap.add_argument("--sweep-window", type=str, default=None,
                    help="comma list of in-flight group depths; runs ONLY "
                         "the fpd3 per-frame variant at 6 workers")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patch_toon_tpu.infer.engine import make_multiframe_fn
    from patch_toon_tpu.infer.tiling import (bucket_size, pack_boxes_multi,
                                             tile_boxes_from_mask)
    from patch_toon_tpu.models import GeneratorJ
    from patch_toon_tpu.utils.xla_options import resolve_xla_options

    xla_opts = resolve_xla_options("auto")
    h, w, c = 512, 910, 6
    ps = 80
    gen = GeneratorJ(input_channels=c, use_bias=True, dtype=jnp.bfloat16)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, c)))
    mask = np.ones((h, w), np.float32)
    boxes = tile_boxes_from_mask(mask, ps, 30.0)
    rng = np.random.default_rng(0)

    results = {}

    built = {}  # fpd -> (fn, fb_dev, wts_dev, mask_j, frame_batch);
    # `mode` only changes host-side slicing, so each fpd's program
    # compiles once (a first tunnel compile can take 100s+)

    def build(fpd):
        if fpd in built:
            return built[fpd]
        bucket = bucket_size(fpd * len(boxes))
        fb, wts, _ = pack_boxes_multi([boxes] * fpd, ps, bucket)
        fn = make_multiframe_fn(gen, ps, bucket, fpd, h, w, c, jnp.bfloat16,
                                compiler_options=xla_opts)
        fb_dev, wts_dev = jnp.asarray(fb), jnp.asarray(wts)
        mask_j = jnp.asarray(np.stack([mask] * fpd))[..., None]
        frame_batch = [jnp.asarray(
            rng.random((fpd, h, w, c), np.float32) * 2 - 1) for _ in range(3)]
        for i in range(3):
            np.asarray(fn(g_vars, frame_batch[i % 3], fb_dev, wts_dev,
                          mask_j)[0])
        built[fpd] = (fn, fb_dev, wts_dev, mask_j, frame_batch)
        return built[fpd]

    if args.sweep_workers:
        variants = [(3, "frame", int(n), None)
                    for n in args.sweep_workers.split(",")]
    elif args.sweep_window:
        variants = [(3, "frame", 6, int(n))
                    for n in args.sweep_window.split(",")]
    else:
        variants = [
            (1, "group", 6, None),  # bench headline baseline
            (3, "group", 6, None),  # bench fpd3 baseline (one 4.2 MB fetch)
            (3, "frame", 6, None),  # per-frame slices: 3 x 1.4 MB streams
            (3, "band2", 6, None),  # per-frame, 2 bands: 6 x 0.7 MB streams
        ]
    for fpd, mode, workers, depth in variants:
        fn, fb_dev, wts_dev, mask_j, frame_batch = build(fpd)

        fetch_pool = ThreadPoolExecutor(max_workers=workers)

        def pieces(o):
            if mode == "group":
                return [o]
            if mode == "frame":
                return [o[k] for k in range(fpd)]
            half = h // 2
            return [o[k, b * half:(b + 1) * half]
                    for k in range(fpd) for b in range(2)]

        def one_window() -> float:
            dispatches = max(1, args.frames // fpd)
            t0 = time.perf_counter()
            in_flight = []  # one entry per dispatch: list of futures
            for i in range(dispatches):
                o, _ = fn(g_vars, frame_batch[i % 3], fb_dev, wts_dev,
                          mask_j)
                ps_ = pieces(o)
                for p in ps_:
                    try:
                        p.copy_to_host_async()
                    except Exception:
                        pass
                in_flight.append([fetch_pool.submit(np.asarray, p)
                                  for p in ps_])
                if len(in_flight) > (depth or max(1, 7 // fpd)):
                    for f in in_flight.pop(0):
                        f.result()
            for fs in in_flight:
                for f in fs:
                    f.result()
            return dispatches * fpd / (time.perf_counter() - t0)

        fps = max(one_window() for _ in range(args.windows))
        key = f"fpd{fpd}_{mode}"
        if workers != 6:
            key += f"_w{workers}"
        if depth is not None:
            key += f"_d{depth}"
        results[key] = round(fps, 2)
        print(f"fpd={fpd} mode={mode:6s} workers={workers} "
              f"depth={depth or max(1, 7 // fpd)}: {fps:6.2f} fps",
              flush=True)
        fetch_pool.shutdown(wait=True)

    print(results)


if __name__ == "__main__":
    main()
