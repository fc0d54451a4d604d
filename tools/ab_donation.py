#!/usr/bin/env python
"""A/B: buffer donation on the multiframe tiled program + B=1024 bucket rate.

VERDICT r2 next-round #4 (donation/layout pinning) and the round-3 perf
candidate "B=1024 bucket rate (would enable fpd=6)".

1. donation: jit the multiframe program with donate_argnums on the frame
   and mask buffers vs without. Donation can only help by letting XLA reuse
   the donated HBM for intermediates (the uint8 output can't alias the fp32
   frames), so expect small-or-nothing — measured either way.
2. bucket rate: per-tile generator time at pow2 buckets 256..1024. If 1024
   holds the ~100 us/tile rate, co-batching 6 frames (6x170=1020 tiles)
   becomes profitable.

Methodology: interleaved minima (alternate variants within each round so
tunnel/host congestion drifts hit all equally), dispatch-difference timing
(T(2n)-T(n) queued, one tiny fetch) per measurement.

Run on the TPU machine: python tools/ab_donation.py [--out docs/perf/...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patch_toon_tpu.infer.engine import _multiframe_body
    from patch_toon_tpu.infer.tiling import (
        bucket_size,
        pack_boxes_multi,
        tile_boxes_from_mask,
    )
    from patch_toon_tpu.models import GeneratorJ
    from patch_toon_tpu.utils.xla_options import resolve_xla_options

    xla_opts = resolve_xla_options("auto")
    h, w, c = 512, 910, 6
    ps = 80
    gen = GeneratorJ(
        input_channels=c, use_bias=True, tanh=True, append_smoothers=True,
        resnet_blocks=7, filters=(32, 64, 128, 128, 128, 64),
        dtype=jnp.bfloat16)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, c)))
    rng = np.random.default_rng(0)
    mask = np.ones((h, w), np.float32)
    boxes = tile_boxes_from_mask(mask, ps, 30.0)
    print(f"{len(boxes)} tiles/frame")

    # ---- 1. donation A/B on the fpd=3 multiframe program ----------------
    fpd = 3
    bucket = bucket_size(fpd * len(boxes))
    body = _multiframe_body(gen, ps, bucket, fpd, h, w, c, jnp.bfloat16)
    fb, wts, _ = pack_boxes_multi([boxes] * fpd, ps, bucket)
    base = jax.jit(body, compiler_options=xla_opts)
    # donate frames (arg 1) and masks (arg 4): uint8/float outputs can't
    # alias the 6-channel input, but XLA may reuse the HBM for temporaries
    dona = jax.jit(body, donate_argnums=(1, 4), compiler_options=xla_opts)
    args_j = (jnp.asarray(fb), jnp.asarray(wts),
              jnp.asarray(np.stack([mask] * fpd))[..., None])

    def mk_frames():
        return jnp.asarray(rng.random((fpd, h, w, c), np.float32) * 2 - 1)

    frames_pool = [mk_frames() for _ in range(4)]

    def run_base(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = base(g_vars, frames_pool[i % 4], *args_j)
        np.asarray(out[0][0, 0, 0])
        return time.perf_counter() - t0

    def run_dona(n):
        # donation consumes the frame/mask buffers, so each dispatch needs
        # a fresh one — pre-put OUTSIDE the timer (H2D through the tunnel
        # would swamp the compute difference being measured)
        frs = [jax.device_put(frames_pool[i % 4]) for i in range(n)]
        masks = [jax.device_put(args_j[2]) for _ in range(n)]
        jax.block_until_ready((frs, masks))
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = dona(g_vars, frs[i], args_j[0], args_j[1], masks[i])
        np.asarray(out[0][0, 0, 0])
        return time.perf_counter() - t0

    for f in (run_base, run_dona):
        f(2)  # compile+warm
    n = 6
    mins = {"base": float("inf"), "donate": float("inf")}
    for r in range(args.rounds):
        for name, f in (("base", run_base), ("donate", run_dona)):
            dt = f(2 * n) - f(n)
            mins[name] = min(mins[name], dt / (n * fpd))
    print(f"donation A/B (ms/frame, min): base {1e3 * mins['base']:.2f}  "
          f"donate {1e3 * mins['donate']:.2f}  "
          f"({mins['base'] / mins['donate']:.3f}x)")

    # ---- 2. bucket-size rate sweep --------------------------------------
    rates = {}
    for bkt in (256, 512, 1024):
        body_b = _multiframe_body(gen, ps, bkt, 1, h, w, c, jnp.bfloat16)
        fn = jax.jit(body_b, compiler_options=xla_opts)
        nb = min(len(boxes), bkt)
        fbb, wtb, _ = pack_boxes_multi([boxes[:nb]], ps, bkt)
        a = (jnp.asarray(fbb), jnp.asarray(wtb),
             jnp.asarray(mask[None])[..., None])
        fr = [jnp.asarray(rng.random((1, h, w, c), np.float32) * 2 - 1)
              for _ in range(3)]
        np.asarray(fn(g_vars, fr[0], *a)[0])

        def q(nn, fn=fn, a=a, fr=fr):
            out = None
            t0 = time.perf_counter()
            for i in range(nn):
                out = fn(g_vars, fr[i % 3], *a)
            np.asarray(out[0][0, 0, 0])
            return time.perf_counter() - t0

        q(2)
        best = min(q(12) - q(6) for _ in range(args.rounds)) / 6
        rates[bkt] = best / bkt * 1e6
        print(f"bucket {bkt}: {rates[bkt]:.1f} us/tile "
              f"({1e3 * best:.1f} ms/dispatch)")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"donation_ms_per_frame": {
                k: round(1e3 * v, 3) for k, v in mins.items()},
                "bucket_us_per_tile": {str(k): round(v, 2)
                                       for k, v in rates.items()}}, f,
                indent=1)


if __name__ == "__main__":
    main()
