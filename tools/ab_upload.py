#!/usr/bin/env python
"""A/B: uint8 vs fp32 frame upload through the real engine dispatch path.

The engine's H2D traffic per 512p c6 frame is ~11.2 MB as fp32 (+1.9 MB
fp32 mask) vs ~2.8 MB as uint8 (+0.47 MB u8 mask) — a 4.2x cut on the
wire. Through the axon tunnel H2D runs ~25-42 MB/s regardless of data
content (tools/profile_transport.py h2d_* rows), so the upload dominates
end-to-end streaming cost on constrained links. This tool measures the
real difference: one multiframe dispatch per group, upload included,
output fetch included, interleaved rounds so congestion drift hits both
arms equally (the interleaved-minima methodology of tools/ab_xla_flags.py).

Run on the TPU machine:  python tools/ab_upload.py [--rounds 5]
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
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--fpd", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patch_toon_tpu.infer.engine import make_multiframe_fn
    from patch_toon_tpu.infer.tiling import (
        bucket_size, pack_boxes_multi, tile_boxes_from_mask)
    from patch_toon_tpu.models import GeneratorJ
    from patch_toon_tpu.utils.xla_options import resolve_xla_options

    h, w, c, ps, fpd = 512, 910, 6, 80, args.fpd
    gen = GeneratorJ(input_channels=c, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64),
                     dtype=jnp.bfloat16)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, c)))
    xla_opts = resolve_xla_options("auto")

    mask = np.ones((h, w), np.float32)
    boxes = tile_boxes_from_mask(mask, ps, 30.0)
    bucket = bucket_size(fpd * len(boxes))
    fb, wts, _ = pack_boxes_multi([boxes] * fpd, ps, bucket)
    fn = make_multiframe_fn(gen, ps, bucket, fpd, h, w, c, jnp.bfloat16,
                            compiler_options=xla_opts)
    fb_j, wts_j = jnp.asarray(fb), jnp.asarray(wts)

    rng = np.random.default_rng(0)
    host_u8 = [rng.integers(0, 255, (fpd, h, w, c), dtype=np.uint8)
               for _ in range(3)]
    host_f32 = [x.astype(np.float32) / 255.0 * 2.0 - 1.0 for x in host_u8]
    mask_u8 = np.ones((fpd, h, w, 1), np.uint8)
    mask_f32 = mask_u8.astype(np.float32)

    n_groups = max(1, args.frames // fpd)

    def run(hosts, m):
        t0 = time.perf_counter()
        out = None
        for i in range(n_groups):
            out = fn(g_vars, jnp.asarray(hosts[i % 3]), fb_j, wts_j,
                     jnp.asarray(m))
        np.asarray(out[0])
        return (time.perf_counter() - t0) / (n_groups * fpd)

    # warm both traced programs + steady state
    for _ in range(2):
        run(host_u8, mask_u8)
        run(host_f32, mask_f32)

    t_u8, t_f32 = [], []
    for r in range(args.rounds):
        t_u8.append(run(host_u8, mask_u8))
        t_f32.append(run(host_f32, mask_f32))

    mb_u8 = (host_u8[0].nbytes + mask_u8.nbytes) / fpd / 1e6
    mb_f32 = (host_f32[0].nbytes + mask_f32.nbytes) / fpd / 1e6
    r_u8 = min(t_u8) * 1e3
    r_f32 = min(t_f32) * 1e3
    print(f"upload u8 : {mb_u8:5.2f} MB/frame  min {r_u8:7.1f} ms/frame "
          f"({1e3 / r_u8:.1f} fps)")
    print(f"upload f32: {mb_f32:5.2f} MB/frame  min {r_f32:7.1f} ms/frame "
          f"({1e3 / r_f32:.1f} fps)")
    print(f"speedup: {r_f32 / r_u8:.2f}x")
    if args.out:
        Path(args.out).write_text(json.dumps({
            "u8_ms_per_frame_min": round(r_u8, 2),
            "f32_ms_per_frame_min": round(r_f32, 2),
            "u8_ms_all": [round(t * 1e3, 2) for t in t_u8],
            "f32_ms_all": [round(t * 1e3, 2) for t in t_f32],
            "u8_MB_per_frame": round(mb_u8, 2),
            "f32_MB_per_frame": round(mb_f32, 2),
            "speedup": round(r_f32 / r_u8, 3),
        }, indent=1))


if __name__ == "__main__":
    main()
