#!/usr/bin/env python
"""Pairwise dense optical flow over a frame directory.

Same interface, file naming, and masking semantics as reference
tools/optical_flow.py:7-189 — forward flow (frame i -> i+1) saved to
``flow_fwd_dir/{i+1}.npy`` with frame i+1's mask, backward flow
(i -> i-1) saved to ``flow_bwd_dir/{i}.npy`` with frame i's mask; flow is
zeroed outside the binary (>127) mask; output is raw float32 (H, W, 2) npy.

Two backends:
- ``tpu`` (default): the TPU-native pyramidal Lucas–Kanade operator
  (patch_toon_tpu.ops.flow.dense_flow), jitted and run on device;
- ``dis``: cv2's C++ DIS optical flow (the reference's engine,
  optical_flow.py:39) for bit-exact reproduction of reference guides,
  available when opencv is installed.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np
from PIL import Image
from tqdm import tqdm

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class OpticalFlowCalculator:
    def __init__(
        self,
        input_dir: Union[str, Path],
        flow_fwd_dir: Union[str, Path],
        flow_bwd_dir: Union[str, Path],
        mask_dir: Union[str, Path],
        file_format: str = "%03d",
        backend: str = "tpu",
        scale: int = 1,
    ):
        self.input_dir = Path(input_dir)
        self.flow_fwd_dir = Path(flow_fwd_dir)
        self.flow_bwd_dir = Path(flow_bwd_dir)
        self.mask_dir = Path(mask_dir)
        self.file_format = file_format
        self.backend = backend
        # scale 2/4: LK on a downsampled pyramid, displacements upsampled
        # (ops.flow.dense_flow scale=) — cheaper guides, tpu backend only
        self.scale = int(scale)
        if self.scale != 1 and backend != "tpu":
            raise ValueError("--scale requires the tpu backend")

        self.flow_fwd_dir.mkdir(parents=True, exist_ok=True)
        self.flow_bwd_dir.mkdir(parents=True, exist_ok=True)

        self.image_files = self._get_image_files()
        self.image_cache: Dict[Path, np.ndarray] = {}
        self.masks: Dict[int, np.ndarray] = {}

        if backend == "dis":
            import cv2

            self._dis = cv2.DISOpticalFlow_create(
                cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
        elif backend == "tpu":
            self._dis = None
        else:
            raise ValueError(f"Unknown backend {backend!r} (tpu|dis)")

    def _get_image_files(self) -> List[Path]:
        exts = (".png", ".jpg", ".jpeg")
        files = sorted(f for f in self.input_dir.iterdir()
                       if f.suffix.lower() in exts)
        if not files:
            raise ValueError(f"No images found in {self.input_dir}")
        return files

    def _read_image(self, path: Path) -> np.ndarray:
        """Grayscale uint8 (cached), like cv2.IMREAD_GRAYSCALE."""
        if path not in self.image_cache:
            img = Image.open(path).convert("L")
            self.image_cache[path] = np.asarray(img, dtype=np.uint8)
        return self.image_cache[path]

    def _read_mask(self, index: int) -> np.ndarray:
        """Binary bool mask for frame ``index`` (>127 is tracked)."""
        if index not in self.masks:
            mask_path = self.mask_dir / f"{self.file_format % index}.jpg"
            if not mask_path.exists():
                # tolerate .png masks too
                alt = self.mask_dir / f"{self.file_format % index}.png"
                if not alt.exists():
                    raise ValueError(f"Mask file not found: {mask_path}")
                mask_path = alt
            mask = np.asarray(Image.open(mask_path).convert("L"))
            self.masks[index] = mask > 127
        return self.masks[index]

    def _calculate_flow(self, img1: np.ndarray, img2: np.ndarray,
                        mask: np.ndarray) -> np.ndarray:
        if self.backend == "dis":
            flow = self._dis.calc(img1, img2, None)
            flow[~mask] = 0
            return flow
        import jax.numpy as jnp

        from patch_toon_tpu.ops.flow import masked_flow

        flow = masked_flow(
            jnp.asarray(img1, jnp.float32) / 255.0,
            jnp.asarray(img2, jnp.float32) / 255.0,
            jnp.asarray(mask),
            scale=self.scale,
        )
        return np.asarray(flow, dtype=np.float32)

    def calculate_direction(self, is_forward: bool = True) -> None:
        if len(self.image_files) < 2:
            raise ValueError("Need at least 2 images")
        output_dir = self.flow_fwd_dir if is_forward else self.flow_bwd_dir
        if is_forward:
            indices = range(len(self.image_files) - 1)
            name_of = lambda i: f"{self.file_format % (i + 1)}.npy"  # noqa: E731
        else:
            indices = range(len(self.image_files) - 1, 0, -1)
            name_of = lambda i: f"{self.file_format % i}.npy"  # noqa: E731

        desc = "forward flow" if is_forward else "backward flow"
        for i in tqdm(indices, desc=desc):
            mask = self._read_mask(i + 1 if is_forward else i)
            img1 = self._read_image(self.image_files[i])
            img2 = self._read_image(
                self.image_files[i + 1 if is_forward else i - 1])
            flow = self._calculate_flow(img1, img2, mask)
            np.save(str(output_dir / name_of(i)), flow)

    def calculate_flows(self) -> None:
        try:
            self.calculate_direction(is_forward=True)
            self.calculate_direction(is_forward=False)
            print("Flow calculation complete")
        finally:
            self.image_cache.clear()


def main() -> int:
    parser = argparse.ArgumentParser(description="Dense optical flow")
    parser.add_argument("input_dir")
    parser.add_argument("mask_dir")
    parser.add_argument("flow_fwd_dir")
    parser.add_argument("flow_bwd_dir")
    parser.add_argument("--format", default="%03d")
    parser.add_argument("--backend", choices=["tpu", "dis"], default="tpu")
    parser.add_argument("--scale", type=int, choices=[1, 2, 4], default=1,
                        help="tpu backend: LK on a downsampled pyramid, "
                        "displacements upsampled (cheaper, sub-pixel lost)")
    args = parser.parse_args()
    try:
        OpticalFlowCalculator(
            args.input_dir, args.flow_fwd_dir, args.flow_bwd_dir,
            args.mask_dir, args.format, backend=args.backend,
            scale=args.scale,
        ).calculate_flows()
        return 0
    except Exception as e:
        print(f"Error: {e}")
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
