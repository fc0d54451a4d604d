#!/usr/bin/env python
"""Build temporal-guide training channels: flow-warped previous stylized frame.

For each training frame i the guide image is
``warp(output[i-1], flow_bwd[i])`` — the previous frame's stylized output
backward-warped to frame i's geometry (frame 0 uses its own input RGB as the
bootstrap, matching the inference engine's behavior). Training with
``data.additional_channels.temporal.{path,depth:3}`` pointing at the
generated directory teaches the generator to respect the previous stylized
frame, and ``inference.temporal.enabled=true`` then chains real outputs at
video time — the temporal-consistency capability beyond the reference's
static guide channels.

    python tools/temporal_guide.py scene/input scene/output scene/flow_bwd scene/temporal
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_temporal_guides(input_dir: str, output_dir: str, flow_bwd_dir: str,
                          out_dir: str, file_format: str = "%03d") -> int:
    import jax.numpy as jnp

    from patch_toon_tpu.ops.flow import warp_image

    input_dir = Path(input_dir)
    output_dir = Path(output_dir)
    flow_bwd_dir = Path(flow_bwd_dir)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    frames = sorted(p for p in output_dir.iterdir()
                    if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
    if not frames:
        raise ValueError(f"No stylized frames in {output_dir}")

    written = 0
    for i, frame_path in enumerate(frames):
        if i == 0:
            src = input_dir / frame_path.name
            if not src.exists():
                src = frame_path
            guide = np.asarray(Image.open(src).convert("RGB"))
        else:
            prev = np.asarray(
                Image.open(frames[i - 1]).convert("RGB"), dtype=np.float32)
            flow_path = flow_bwd_dir / f"{file_format % i}.npy"
            if flow_path.exists():
                flow = jnp.asarray(np.load(str(flow_path)))
                guide = np.asarray(
                    warp_image(jnp.asarray(prev), flow))
            else:
                print(f"Warning: no flow for frame {i}; copying previous")
                guide = prev
            guide = np.clip(np.round(guide), 0, 255).astype(np.uint8)
        Image.fromarray(guide).save(out / f"{frame_path.stem}.png")
        written += 1
    print(f"Wrote {written} temporal guides to {out}")
    return written


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Temporal-guide channel generator")
    parser.add_argument("input_dir", help="original frames (frame-0 bootstrap)")
    parser.add_argument("output_dir", help="stylized keyframes")
    parser.add_argument("flow_bwd_dir", help="backward flow .npy directory")
    parser.add_argument("out_dir", help="guide-channel output directory")
    parser.add_argument("--file-format", default="%03d")
    args = parser.parse_args()
    build_temporal_guides(args.input_dir, args.output_dir, args.flow_bwd_dir,
                          args.out_dir, args.file_format)


if __name__ == "__main__":
    main()
