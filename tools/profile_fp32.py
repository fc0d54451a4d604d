#!/usr/bin/env python
"""fp32-parity vs 32_fast vs bf16: the accuracy-throughput table
(VERDICT r3 #4).

Strict ``inference.precision=32`` is the bit-parity serving mode (HIGHEST-
precision convs; ~7 fps/frame measured r3) — users need a number for what
``32_fast`` (fp32 tensors, tf32-style 3-pass bf16 convs) and plain bf16
actually cost in output accuracy to choose the faster modes. This tool
stylizes REAL keyframes (PlatinumChan 540x960) with a TRAINED checkpoint
through the real engine at all three precisions and reports, per mode:

- compute-only ms/frame (dispatch-difference, median — CLAUDE.md
  methodology) and fps,
- output delta vs strict fp32: max |d| in uint8 counts, % pixels
  differing, masked PSNR (inside the eroded stylization mask).

Usage:
  python tools/profile_fp32.py --ckpt docs/quality_2000/ours_ckpt/last
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
SCENE = Path("/root/reference/test_dataset/PlatinumChan_x0.5_train")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=str(
        REPO / "docs" / "quality_2000" / "ours_ckpt" / "last"))
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=str(REPO / "docs" / "perf" /
                                         "fp32_modes_r4.json"))
    args = ap.parse_args()

    import jax  # noqa: E402

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer.engine import StyleTransferInference

    names = sorted(p.name for p in (SCENE / "input").glob("*.png"))[
        : args.frames]

    def make_engine(precision):
        cfg = compose(REPO / "config", "inference", overrides=[
            f"paths.checkpoint={args.ckpt}",
            f"paths.input_dir={SCENE / 'input'}",
            f"paths.mask_dir={SCENE / 'mask'}",
            f"paths.output_dir=/tmp/fp32_modes_{precision}",
            f"paths.additional_channels.point_vector.path="
            f"{SCENE / 'tracking'}",
            "inference.mode=tiled",
            f"inference.precision={precision}",
            "data.patch_size=80",
        ])
        return StyleTransferInference(cfg)

    results = {"ckpt": str(args.ckpt), "frames": names,
               "device": str(jax.devices()[0])}
    outputs = {}
    masks = {}
    for precision in ("32", "32_fast", "bf16"):
        eng = make_engine(precision)
        frames, emasks, boxlists = [], [], []
        for n in names:
            frame = eng._load_frame(str(SCENE / "input" / n))
            mask = eng._load_eroded_mask(str(SCENE / "mask" / n),
                                         frame.shape[:2])
            frames.append(frame)
            emasks.append(mask)
            from patch_toon_tpu.infer.tiling import tile_boxes_from_mask
            boxlists.append(tile_boxes_from_mask(mask, eng.patch_size,
                                                 eng.overlap_percent))
        masks[precision] = emasks

        # outputs for the accuracy comparison
        outs = []
        for f, m, b in zip(frames, emasks, boxlists):
            u8, _, _ = eng._stylize_device(f, m, boxes=b)
            outs.append(np.asarray(u8))
        outputs[precision] = outs

        # compute-only: queue n dispatches round-robin over the frames,
        # sync on one pixel; difference two run lengths (median)
        def queued(n):
            out = None
            t0 = time.perf_counter()
            for i in range(n):
                out, _, _ = eng._stylize_device(
                    frames[i % len(frames)], emasks[i % len(frames)],
                    boxes=boxlists[i % len(frames)])
            np.asarray(out[0, 0, 0])
            return time.perf_counter() - t0

        queued(2)  # warm
        base = 4 if precision != "32" else 2  # strict fp32 is ~10x slower
        ms = float(np.median(
            [(queued(2 * base) - queued(base)) / base * 1e3
             for _ in range(args.reps)]))
        results[f"{precision}_ms_per_frame"] = round(ms, 1)
        results[f"{precision}_fps"] = round(1e3 / ms, 2)
        print(f"{precision}: {ms:.1f} ms/frame = {1e3 / ms:.2f} fps",
              flush=True)

    def psnr(a, b, sel):
        mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2)[sel]
        if not mse.size or mse.mean() == 0:
            return float("inf")
        return 10.0 * np.log10(255.0 ** 2 / mse.mean())

    for precision in ("32_fast", "bf16"):
        maxd, frac, ps = 0, 0.0, []
        for ref, got, m in zip(outputs["32"], outputs[precision],
                               masks["32"]):
            d = np.abs(ref.astype(np.int32) - got.astype(np.int32))
            maxd = max(maxd, int(d.max()))
            frac = max(frac, float((d > 0).mean()))
            ps.append(psnr(ref, got, (m > 0)))
        results[f"{precision}_max_abs_delta_u8"] = maxd
        results[f"{precision}_pct_pixels_diff"] = round(100 * frac, 3)
        results[f"{precision}_masked_psnr_vs_32"] = round(
            float(np.mean(ps)), 2)
        print(f"{precision} vs strict 32: max|d|={maxd} counts, "
              f"{100 * frac:.3f}% pixels differ, masked PSNR "
              f"{np.mean(ps):.2f} dB", flush=True)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
