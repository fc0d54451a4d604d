#!/usr/bin/env python
"""Resize + mask-extraction preprocessing CLI.

Same interface and behavior as reference tools/imageprocessor.py:8-183:
resizes the ``input/``, ``output/``, ``tracking/`` subdirectories of a scene
to a target width or scale (LANCZOS, JPEG quality 95), keeping a per-image
size registry so companion images match the input's resolution, and extracts
``mask/`` JPEGs from the input's alpha channel when the input is RGBA.

Host-side tool (pure PIL) — produces the directories the training data layer
and the guide-channel pipeline consume.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, List, Tuple, Union

from PIL import Image
from tqdm import tqdm


class ImageProcessor:
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

        self.input_images_dir = self.input_dir / "input"
        self.input_output_dir = self.input_dir / "output"
        self.input_tracking_dir = self.input_dir / "tracking"

        self.output_input_dir = self.output_dir / "input"
        self.output_mask_dir = self.output_dir / "mask"
        self.output_output_dir = self.output_dir / "output"
        self.output_tracking_dir = self.output_dir / "tracking"
        for d in (self.output_input_dir, self.output_mask_dir,
                  self.output_output_dir, self.output_tracking_dir):
            d.mkdir(parents=True, exist_ok=True)

    def calculate_target_size(self, img: Image.Image, base_name: str) -> Tuple[int, int]:
        if self.size_mode == "width":
            tw = int(self.size_value)
            th = int(tw * img.height / img.width)
        else:  # scale
            tw = int(img.width * self.size_value)
            th = int(img.height * self.size_value)
        self.target_sizes[base_name] = (tw, th)
        return tw, th

    def get_target_size(self, base_name: str) -> Tuple[int, int]:
        return self.target_sizes.get(
            base_name, (int(self.size_value), int(self.size_value)))

    def process_input_image(self, img_path: Path) -> None:
        try:
            img = Image.open(img_path)
            tw, th = self.calculate_target_size(img, img_path.stem)

            resized = img.copy()
            if img.mode != "RGB":
                resized = resized.convert("RGB")
            resized = resized.resize((tw, th), Image.Resampling.LANCZOS)
            resized.save(self.output_input_dir / img_path.name, "JPEG",
                         quality=95)

            if img.mode == "RGBA":  # alpha channel -> mask JPEG
                alpha = img.split()[3]
                mask = alpha.resize((tw, th), Image.Resampling.LANCZOS)
                mask.convert("RGB").save(
                    self.output_mask_dir / f"{img_path.stem}.jpg", "JPEG",
                    quality=95)
        except Exception as e:
            print(f"Error processing input image {img_path.name}: {e}")

    def process_other_image(self, img_path: Path, output_subdir: Path) -> None:
        try:
            img = Image.open(img_path)
            tw, th = self.get_target_size(img_path.stem)
            resized = img.copy()
            if img.mode != "RGB":
                resized = resized.convert("RGB")
            resized = resized.resize((tw, th), Image.Resampling.LANCZOS)
            resized.save(output_subdir / img_path.name, "JPEG", quality=95)
        except Exception as e:
            print(f"Error processing {img_path.name}: {e}")

    @staticmethod
    def get_image_files(directory: Path) -> List[Path]:
        if not directory.exists():
            return []
        exts = {".png", ".jpg", ".jpeg"}
        return sorted(f for f in directory.iterdir()
                      if f.is_file() and f.suffix.lower() in exts)

    def process_directory(self) -> None:
        input_files = self.get_image_files(self.input_images_dir)
        if not input_files:
            print("No input images found in input directory")
            return
        for p in tqdm(input_files, desc="Input images", unit="images"):
            self.process_input_image(p)

        output_files = self.get_image_files(self.input_output_dir)
        tracking_files = self.get_image_files(self.input_tracking_dir)
        with tqdm(total=len(output_files) + len(tracking_files),
                  desc="Other images", unit="images") as pbar:
            for p in output_files:
                self.process_other_image(p, self.output_output_dir)
                pbar.update(1)
            for p in tracking_files:
                self.process_other_image(p, self.output_tracking_dir)
                pbar.update(1)
        print("Processing complete!")


def main() -> int:
    parser = argparse.ArgumentParser(description="Image and Mask Generator")
    parser.add_argument("input_dir", help="Input directory containing images")
    parser.add_argument("output_dir", help="Output base directory")
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
