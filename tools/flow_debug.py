#!/usr/bin/env python
"""Flow quiver-plot debug visualizer (reference tools/flow_debug.py:8-164).

Overlays the flow field (.npy) on a 50/50 blend of consecutive frames as a
matplotlib quiver plot, one PNG per frame pair.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from patch_toon_tpu.ops.resize import resize_bilinear_np


class FlowDebugVisualizer:
    def __init__(self, input_dir: str, flow_dir: str, output_dir: str,
                 frame_start: int = 1, frame_end: Optional[int] = None,
                 skip_frames: int = 1, flow_scale: float = 1.0,
                 grid_size: int = 20):
        self.input_dir = Path(input_dir)
        self.flow_dir = Path(flow_dir)
        self.output_dir = Path(output_dir)
        self.frame_start = frame_start
        self.frame_end = frame_end
        self.skip_frames = skip_frames
        self.flow_scale = flow_scale
        self.grid_size = grid_size
        self.output_dir.mkdir(parents=True, exist_ok=True)

    def _load_image(self, frame_num: int) -> Optional[np.ndarray]:
        for ext in (".png", ".jpg", ".jpeg"):
            p = self.input_dir / f"{frame_num:03d}{ext}"
            if p.exists():
                return np.asarray(Image.open(p).convert("RGB"))
        return None

    def _load_flow(self, frame_num: int) -> Optional[np.ndarray]:
        p = self.flow_dir / f"{frame_num:03d}.npy"
        return np.load(str(p)) if p.exists() else None

    def _grid_points(self, shape: Tuple[int, ...]):
        h, w = shape[:2]
        y, x = np.mgrid[self.grid_size // 2:h:self.grid_size,
                        self.grid_size // 2:w:self.grid_size]
        return x, y

    def visualize_frame(self, frame_num: int) -> bool:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        flow = self._load_flow(frame_num)
        img1 = self._load_image(frame_num)
        img2 = self._load_image(frame_num + 1)
        if img1 is None or img2 is None or flow is None:
            print(f"Failed to load data for frame {frame_num}")
            return False

        overlay = (img1.astype(np.float32) * 0.5
                   + img2.astype(np.float32) * 0.5).astype(np.uint8)
        x, y = self._grid_points(img1.shape)
        u = resize_bilinear_np(flow[..., 0], x.shape)
        v = resize_bilinear_np(flow[..., 1], x.shape)

        plt.figure(figsize=(12, 8))
        plt.imshow(overlay)
        plt.quiver(x, y, u * self.flow_scale, v * self.flow_scale,
                   color="r", scale_units="xy", scale=1, angles="xy",
                   width=0.003)
        plt.title(f"Flow Visualization - Images "
                  f"{frame_num:03d}-{frame_num + 1:03d}")
        plt.axis("off")
        plt.savefig(self.output_dir / f"flow_{frame_num:03d}.png",
                    bbox_inches="tight", pad_inches=0)
        plt.close()
        return True

    def visualize_all(self) -> None:
        if self.frame_end is None:
            flow_files = list(self.flow_dir.glob("*.npy"))
            if not flow_files:
                raise ValueError("No flow files found")
            self.frame_end = max(int(f.stem) for f in flow_files)
        for frame in range(self.frame_start, self.frame_end + 1,
                           self.skip_frames):
            if not self.visualize_frame(frame):
                print(f"Skipped frame {frame}")
        print("Visualization complete!")


def main() -> None:
    parser = argparse.ArgumentParser(description="Optical Flow Debug Visualizer")
    parser.add_argument("input_dir")
    parser.add_argument("flow_dir")
    parser.add_argument("output_dir")
    parser.add_argument("--start", type=int, default=1)
    parser.add_argument("--end", type=int)
    parser.add_argument("--skip", type=int, default=1)
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--grid", type=int, default=20)
    args = parser.parse_args()
    FlowDebugVisualizer(args.input_dir, args.flow_dir, args.output_dir,
                        args.start, args.end, args.skip, args.scale,
                        args.grid).visualize_all()


if __name__ == "__main__":
    main()
