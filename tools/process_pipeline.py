#!/usr/bin/env python
"""Guide-channel preprocessing pipeline orchestrator.

Chains: ImageProcessor (resize + alpha-mask extraction) -> OpticalFlow
(forward+backward) -> GaussianFilter (r10 sigma10) -> GaussianFilter (r10
sigma15), with keyframes every 10 frames — the reference
tools/process_pipeline.py:10-115 flow, with its shipped API drift fixed
(the reference passes a stale ``use_gpu=`` kwarg and omits ``mask_dir``,
raising TypeError — SURVEY.md §2 'bit-rotted').
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Union

sys.path.insert(0, str(Path(__file__).resolve().parent))

from gaussian_filter import GaussianFilter
from imageprocessor import ImageProcessor
from optical_flow import OpticalFlowCalculator


def process_pipeline(
    input_dir: str,
    output_base_dir: str,
    resize_mode: str = "width",
    resize_value: Union[int, float] = 512,
    flow_backend: str = "tpu",
    file_format: str = "%03d",
) -> None:
    output_base_dir = Path(output_base_dir)
    input_dir_resized = output_base_dir / "input"
    mask_dir = output_base_dir / "mask"
    flow_fwd_dir = output_base_dir / "flow_fwd"
    flow_bwd_dir = output_base_dir / "flow_bwd"

    print("\n[1/4] Resize scene + extract masks")
    ImageProcessor(
        input_dir=input_dir, output_dir=str(output_base_dir),
        size_mode=resize_mode, size_value=resize_value,
    ).process_directory()

    print("\n[2/4] Dense optical flow (fwd+bwd)")
    OpticalFlowCalculator(
        input_dir=str(input_dir_resized),
        flow_fwd_dir=str(flow_fwd_dir),
        flow_bwd_dir=str(flow_bwd_dir),
        mask_dir=str(mask_dir),
        file_format=file_format,
        backend=flow_backend,
    ).calculate_flows()

    input_images = sorted(
        p for ext in (".png", ".jpg", ".jpeg")
        for p in input_dir_resized.glob(f"*{ext}"))
    if not input_images:
        raise ValueError(f"No input images found in {input_dir_resized}")

    frame_first, frame_last = 1, len(input_images)
    key_frames = list(range(frame_first, frame_last + 1, 10))
    if frame_last not in key_frames:
        key_frames.append(frame_last)

    for sigma in (10.0, 15.0):
        print(f"\n[3-4/4] Gaussian splat guides (r10_s{int(sigma)})")
        GaussianFilter(
            mask_dir=str(mask_dir),
            flow_fwd_dir=str(flow_fwd_dir),
            flow_bwd_dir=str(flow_bwd_dir),
            output_dir=str(output_base_dir / f"gauss_r10_s{int(sigma)}"),
            frame_first=frame_first, frame_last=frame_last,
            key_frames=key_frames, radius=10.0, sigma=sigma,
            file_format=file_format,
        ).process()

    print(f"\nGuide pipeline finished -> {output_base_dir}")


def main() -> int:
    parser = argparse.ArgumentParser(description="Image Processing Pipeline")
    parser.add_argument("input_dir")
    parser.add_argument("output_dir")
    parser.add_argument("--resize-mode", choices=["width", "scale"],
                        default="width")
    parser.add_argument("--resize-value", type=float, default=512)
    parser.add_argument("--flow-backend", choices=["tpu", "dis"],
                        default="tpu")
    parser.add_argument("--file-format", default="%03d")
    args = parser.parse_args()
    try:
        process_pipeline(
            input_dir=args.input_dir, output_base_dir=args.output_dir,
            resize_mode=args.resize_mode, resize_value=args.resize_value,
            flow_backend=args.flow_backend, file_format=args.file_format,
        )
        return 0
    except Exception as e:
        print(f"Error: {e}")
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
