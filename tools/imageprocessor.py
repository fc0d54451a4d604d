#!/usr/bin/env python
"""Scene resize + alpha-mask extraction CLI.

Behavioral parity with the reference preprocessing tool
(tools/imageprocessor.py:8-183): given a scene directory with ``input/``,
``output/`` and ``tracking/`` subdirectories, resize everything to a target
width or scale (LANCZOS, JPEG quality 95, original filenames kept), size
companion images to match their same-named input frame, and extract a
``mask/<stem>.jpg`` from the alpha channel of RGBA inputs.

Implementation is plan-based rather than per-directory-method: a cheap
header-only pass over ``input/`` builds the size registry, then one flat list
of resize jobs is executed uniformly with per-file error resilience.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

from PIL import Image
from tqdm import tqdm

_IMAGE_EXTS = {".png", ".jpg", ".jpeg"}
_SUBDIRS = ("input", "output", "tracking")  # resized as-is
_JPEG_OPTS = dict(format="JPEG", quality=95)


def list_images(directory: Path) -> List[Path]:
    if not directory.exists():
        return []
    return sorted(p for p in directory.iterdir()
                  if p.is_file() and p.suffix.lower() in _IMAGE_EXTS)


def scaled_size(width: int, height: int, size_mode: str,
                size_value: float) -> Tuple[int, int]:
    """Target (w, h): fixed width with proportional height, or a scale."""
    if size_mode == "width":
        tw = int(size_value)
        return tw, int(tw * height / width)
    return int(width * size_value), int(height * size_value)


def build_size_registry(input_files: List[Path], size_mode: str,
                        size_value: float) -> Dict[str, Tuple[int, int]]:
    """stem -> target size, from image headers only (no pixel decode)."""
    registry: Dict[str, Tuple[int, int]] = {}
    for path in input_files:
        try:
            with Image.open(path) as img:
                registry[path.stem] = scaled_size(
                    img.width, img.height, size_mode, size_value)
        except Exception as e:
            print(f"Could not read size of {path.name}: {e}")
    return registry


@dataclass(frozen=True)
class ResizeJob:
    src: Path
    dst: Path                       # JPEG bytes under the source filename
    size: Tuple[int, int]
    mask_dst: Optional[Path] = None  # alpha -> mask JPEG (RGBA inputs only)

    def run(self) -> None:
        with Image.open(self.src) as img:
            rgb = img if img.mode == "RGB" else img.convert("RGB")
            rgb.resize(self.size, Image.Resampling.LANCZOS).save(
                self.dst, **_JPEG_OPTS)
            if self.mask_dst is not None and img.mode == "RGBA":
                alpha = img.getchannel("A")
                alpha.resize(self.size, Image.Resampling.LANCZOS).convert(
                    "RGB").save(self.mask_dst, **_JPEG_OPTS)


class ImageProcessor:
    """Thin driver: plan all jobs for the scene, then execute them."""

    def __init__(
        self,
        input_dir: Union[str, Path],
        output_dir: Union[str, Path],
        size_mode: str = "width",
        size_value: float = 512,
    ):
        self.input_dir = Path(input_dir)
        self.output_dir = Path(output_dir)
        self.size_mode = size_mode
        self.size_value = size_value
        self.target_sizes: Dict[str, Tuple[int, int]] = {}
        for name in _SUBDIRS + ("mask",):
            (self.output_dir / name).mkdir(parents=True, exist_ok=True)

    def _default_size(self) -> Tuple[int, int]:
        # companions with no same-named input frame fall back to a square
        return int(self.size_value), int(self.size_value)

    def plan(self) -> List[ResizeJob]:
        input_files = list_images(self.input_dir / "input")
        self.target_sizes = build_size_registry(
            input_files, self.size_mode, self.size_value)
        jobs: List[ResizeJob] = []
        for subdir in _SUBDIRS:
            for src in list_images(self.input_dir / subdir):
                jobs.append(ResizeJob(
                    src=src,
                    dst=self.output_dir / subdir / src.name,
                    size=self.target_sizes.get(src.stem, self._default_size()),
                    mask_dst=(self.output_dir / "mask" / f"{src.stem}.jpg")
                    if subdir == "input" else None,
                ))
        return jobs

    def process_directory(self) -> None:
        jobs = self.plan()
        if not self.target_sizes:
            print(f"Nothing to do: no images under "
                  f"{self.input_dir / 'input'}")
            return
        failures = 0
        for job in tqdm(jobs, desc="Resizing scene", unit="img"):
            try:
                job.run()
            except Exception as e:
                failures += 1
                print(f"Failed on {job.src.name}: {e}")
        done = len(jobs) - failures
        print(f"Scene resized: {done}/{len(jobs)} images"
              + (f" ({failures} failed)" if failures else ""))


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Resize a scene and extract alpha masks")
    parser.add_argument("input_dir", help="Scene directory (input/output/tracking)")
    parser.add_argument("output_dir", help="Destination scene directory")
    parser.add_argument("--size-mode", choices=["width", "scale"],
                        default="width")
    parser.add_argument("--size-value", type=float, default=512)
    args = parser.parse_args()
    try:
        ImageProcessor(args.input_dir, args.output_dir, args.size_mode,
                       args.size_value).process_directory()
        return 0
    except Exception as e:
        print(f"Error: {e}")
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
