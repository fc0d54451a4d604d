#!/usr/bin/env python
"""A/B: the temporal-chain frame prologue — eager ops vs the fused program,
and fp32 vs fp16 flow upload.

The temporal chain is strictly sequential (frame i+1 needs frame i's
stylized output), so everything on its per-frame critical path multiplies
into the stream's frame time. Before r3 the prologue ran as eager ops
(normalize dispatch + ``warp_image``'s map_coordinates — dozens of small
ops — + slice + cast + concat), and the flow field crossed H2D as fp32
(H*W*2*4 B ≈ 4.0 MB at 540x960 — the biggest single transfer in temporal
mode, bigger than the uint8 frame). ``engine._temporal_prep`` fuses the
prologue into ONE jitted dispatch and ``inference.temporal.flow_upload``
(auto) ships the flow as float16.

Arms (interleaved rounds so transport drift hits all equally):
  eager_f32   — the pre-r3 formulation
  fused_f32   — one dispatch, fp32 flow
  fused_f16   — one dispatch, fp16 flow (half the flow bytes)
  device_flow — flow computed ON DEVICE (temporal.flow_source=device):
                uploads only the frame + a uint8 flow mask; the LK flow
                rides the MXU/VPU instead of the wire

Each iteration re-uploads frame+flow from fresh host buffers (cycled x3)
and syncs on a 1-row fetch of the result, mimicking the chain's
can't-run-ahead structure.

Run on the TPU machine:  python tools/ab_temporal_prep.py [--rounds 5]
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
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from patch_toon_tpu.infer.engine import (
        _temporal_device_flow, _temporal_prep, _to_signed_unit)
    from patch_toon_tpu.ops.flow import warp_image

    h, w = args.hw
    rng = np.random.default_rng(0)
    frames_u8 = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                 for _ in range(3)]
    flows_f32 = [((rng.random((h, w, 2)).astype(np.float32) - 0.5) * 8)
                 for _ in range(3)]
    flows_f16 = [f.astype(np.float16) for f in flows_f32]
    prev = jnp.asarray(rng.random((h, w, 3)).astype(np.float32) * 2 - 1)

    def eager_prep(frame, flow):
        fdev = jnp.asarray(_to_signed_unit(jnp.asarray(frame)))
        guide = warp_image(prev, jnp.asarray(flow))[..., :3]
        return jnp.concatenate([fdev, guide.astype(jnp.float32)], axis=-1)

    def fused_prep(frame, flow):
        return _temporal_prep(jnp.asarray(frame), prev, jnp.asarray(flow), 3)

    masks_u8 = [rng.integers(0, 2, (h, w), dtype=np.uint8)
                for _ in range(3)]
    gray0 = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))

    def device_prep(frame, mask, scale=1):
        fdev = jnp.asarray(frame)
        flow, _gray = _temporal_device_flow(
            fdev, gray0, jnp.asarray(mask), scale)
        return _temporal_prep(fdev, prev, flow, 3)

    def run(prep, flows):
        t0 = time.perf_counter()
        for i in range(args.frames):
            out = prep(frames_u8[i % 3], flows[i % 3])
            np.asarray(out[:1])  # sync: the chain can't run ahead
        return (time.perf_counter() - t0) / args.frames

    arms = {
        "eager_f32": lambda: run(eager_prep, flows_f32),
        "fused_f32": lambda: run(fused_prep, flows_f32),
        "fused_f16": lambda: run(fused_prep, flows_f16),
        "device_flow": lambda: run(device_prep, masks_u8),
        "device_flow_s2": lambda: run(
            lambda f, m: device_prep(f, m, 2), masks_u8),
        "device_flow_s4": lambda: run(
            lambda f, m: device_prep(f, m, 4), masks_u8),
    }
    for fn in arms.values():  # warm traces
        fn()
    times = {k: [] for k in arms}
    for _ in range(args.rounds):
        for k, fn in arms.items():
            times[k].append(fn())

    mins = {k: min(v) * 1e3 for k, v in times.items()}
    dev_mb = (frames_u8[0].nbytes + masks_u8[0].nbytes) / 1e6
    mb = {"eager_f32": (frames_u8[0].nbytes + flows_f32[0].nbytes) / 1e6,
          "fused_f32": (frames_u8[0].nbytes + flows_f32[0].nbytes) / 1e6,
          "fused_f16": (frames_u8[0].nbytes + flows_f16[0].nbytes) / 1e6,
          "device_flow": dev_mb,
          "device_flow_s2": dev_mb,
          "device_flow_s4": dev_mb}
    for k in arms:
        print(f"{k}: {mb[k]:5.2f} MB/frame H2D  min {mins[k]:7.1f} ms/frame")
    for k in ("fused_f32", "fused_f16", "device_flow", "device_flow_s2",
              "device_flow_s4"):
        print(f"{k} vs eager: {mins['eager_f32'] / mins[k]:.2f}x")
    if args.out:
        Path(args.out).write_text(json.dumps({
            k: {"ms_min": round(mins[k], 2),
                "ms_all": [round(t * 1e3, 2) for t in v],
                "MB_per_frame": round(mb[k], 2)}
            for k, v in times.items()
        } | {"fused_f16_vs_eager":
             round(mins["eager_f32"] / mins["fused_f16"], 3),
             "device_flow_vs_eager":
             round(mins["eager_f32"] / mins["device_flow"], 3)},
            indent=1))


if __name__ == "__main__":
    main()
