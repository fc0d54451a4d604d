#!/usr/bin/env python
"""Flow-advected Gaussian-splat guide-channel generator.

Same interface and output semantics as reference tools/gaussian_filter.py:
Poisson-disk-sample stable points inside each keyframe's mask (capped at
``max_points``), assign golden-ratio HSV colors, advect the points frame by
frame forward (via backward-flow files) and backward (via forward-flow
files) between keyframes, and render every frame as mask-base +
anti-aliased Gaussian color splats (``out = out*(1-w) + color*w``).

TPU-native internals: sampling stays host-side (inherently sequential
Bridson — patch_toon_tpu.ops.poisson), but advection is a batched device
gather (ops.advect) and splatting is a jitted deterministic scan
(ops.splat) replacing the reference's racy numba prange kernel.

One intentional deviation: splat colors are written as RGB. The reference
composes hsv_to_rgb colors into a cv2 BGR canvas (gaussian_filter.py:296-300),
silently swapping R and B in its output files; color identity is arbitrary
for training, so this build keeps true RGB.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from patch_toon_tpu.ops.poisson import golden_ratio_color, poisson_disk_sample


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class PoissonDiskSampling:
    """Reference-compatible wrapper (tools/gaussian_filter.py:143-157)."""

    def __init__(self, radius: float, x_min=None, x_max=None,
                 max_attempts: int = 30, seed: int = 0):
        self.radius = radius
        self.max_attempts = max_attempts
        self.seed = seed

    def generate(self, mask: np.ndarray) -> np.ndarray:
        return poisson_disk_sample(mask, self.radius, self.max_attempts,
                                   self.seed)


class GaussianFilter:
    def __init__(self, mask_dir, flow_fwd_dir, flow_bwd_dir, output_dir,
                 frame_first, frame_last, key_frames, radius, sigma,
                 file_format="%03d", num_workers=None, max_points=1000,
                 seed=0):
        if not key_frames:
            raise ValueError("key_frames list is empty")
        self.mask_dir = Path(mask_dir)
        self.flow_fwd_dir = Path(flow_fwd_dir)
        self.flow_bwd_dir = Path(flow_bwd_dir)
        self.output_dir = Path(output_dir)
        self.frame_first = int(frame_first)
        self.frame_last = int(frame_last)
        self.key_frames = sorted(int(k) for k in key_frames)
        self.radius = float(radius)
        self.sigma = float(sigma)
        self.file_format = file_format
        self.max_points = int(max_points)
        self.seed = seed

        for d in (self.mask_dir, self.flow_fwd_dir, self.flow_bwd_dir):
            if not d.exists():
                raise ValueError(f"Directory does not exist: {d}")
        self.output_dir.mkdir(parents=True, exist_ok=True)

        first_mask = self._read_mask_gray(self.key_frames[0])
        if first_mask is None:
            raise ValueError(
                f"Failed to read initial mask for frame {self.key_frames[0]}")
        self.size = first_mask.shape  # (H, W)

        # per-keyframe, per-frame point sets: pts[k][frame] -> (N,2) (x,y)
        self.pts: Dict[int, Dict[int, np.ndarray]] = {
            k: {} for k in range(len(self.key_frames))}
        self.flow_cache: Dict[Path, np.ndarray] = {}

    # ------------------------------------------------------------------

    def _mask_path(self, frame: int) -> Optional[Path]:
        for ext in (".jpg", ".png", ".jpeg"):
            p = self.mask_dir / f"{self.file_format % frame}{ext}"
            if p.exists():
                return p
        return None

    def _read_mask_gray(self, frame: int) -> Optional[np.ndarray]:
        p = self._mask_path(frame)
        if p is None:
            return None
        return np.asarray(Image.open(p).convert("L"), dtype=np.uint8)

    def _get_flow(self, path: Path) -> Optional[np.ndarray]:
        if path not in self.flow_cache:
            if not path.exists():
                return None
            self.flow_cache[path] = np.load(str(path))
        return self.flow_cache[path]

    def generate_points(self, mask: np.ndarray) -> np.ndarray:
        points = poisson_disk_sample(mask, self.radius, seed=self.seed)
        if len(points) > self.max_points:
            rng = np.random.RandomState(self.seed)
            idx = rng.choice(len(points), self.max_points, replace=False)
            points = points[idx]
        return points

    # ------------------------------------------------------------------

    def _advect_run(self, key_points: np.ndarray, frames, flow_dir: Path,
                    flow_frame_of, store_key: int) -> None:
        """Advect ``key_points`` through consecutive flow files, storing
        surviving points per frame (reference gaussian_filter.py:349-401)."""
        import jax.numpy as jnp

        from patch_toon_tpu.ops.advect import advect_points

        n = len(key_points)
        bucket = _bucket(n)
        pts = np.zeros((bucket, 2), np.float32)
        pts[:n] = key_points
        valid = np.zeros((bucket,), bool)
        valid[:n] = True
        pts_j = jnp.asarray(pts)
        valid_j = jnp.asarray(valid)

        for frame in frames:
            flow = self._get_flow(flow_dir / f"{self.file_format % flow_frame_of(frame)}.npy")
            if flow is None:
                print(f"Warning: no flow data for frame {frame}")
                break
            pts_j, valid_j = advect_points(jnp.asarray(flow), pts_j, valid_j)
            valid_np = np.asarray(valid_j)
            if not valid_np.any():
                break
            # store surviving points in original order (reference drops them)
            self.pts[store_key][frame] = np.asarray(pts_j)[valid_np]

    def process(self) -> None:
        print(f"Starting process with {len(self.key_frames)} key frames")
        for k, key_frame in enumerate(self.key_frames):
            mask = self._read_mask_gray(key_frame)
            if mask is None:
                print(f"Warning: skip key frame {key_frame} (no mask)")
                continue
            key_points = self.generate_points(mask)
            if len(key_points) == 0:
                print(f"Warning: skip key frame {key_frame} (no points)")
                continue
            print(f"Key frame {key_frame}: {len(key_points)} points")
            self.pts[k][key_frame] = key_points

            next_key = (self.key_frames[k + 1]
                        if k + 1 < len(self.key_frames) else float("inf"))
            prev_key = self.key_frames[k - 1] if k > 0 else -1

            # forward: key_frame+1 .. min(next_key, frame_last); flow file
            # (frame-1).npy from the *backward*-flow dir (reference :349-374)
            if key_frame < next_key and key_frame < self.frame_last:
                end = min(next_key, self.frame_last + 1)
                self._advect_run(
                    key_points,
                    range(key_frame + 1, int(end)),
                    self.flow_bwd_dir, lambda f: f - 1, k)

            # backward: key_frame-1 .. max(prev_key, frame_first); flow file
            # frame.npy from the *forward*-flow dir (reference :376-401)
            if key_frame > prev_key and key_frame > self.frame_first:
                start = max(prev_key, self.frame_first - 1)
                self._advect_run(
                    key_points,
                    range(key_frame - 1, int(start), -1),
                    self.flow_fwd_dir, lambda f: f, k)

        print("Drawing and saving results...")
        for frame in range(self.frame_first, self.frame_last + 1):
            msg = self._process_output_frame(frame)
            print(msg)

    def _process_output_frame(self, frame: int) -> str:
        try:
            p = self._mask_path(frame)
            if p is None:
                return f"Warning: No mask found for frame {frame}"
            base = np.asarray(Image.open(p).convert("RGB"),
                              dtype=np.float32) / 255.0

            # nearest keyframe at-or-before this frame (reference :282-291)
            current_key = None
            for key_frame in self.key_frames:
                if key_frame <= frame:
                    current_key = key_frame
                else:
                    break
            output = base
            if current_key is not None:
                k = self.key_frames.index(current_key)
                points = self.pts[k].get(frame)
                if points is not None and len(points) > 0:
                    output = self._render(base, points)

            out_path = self.output_dir / f"{self.file_format % frame}.png"
            Image.fromarray(
                (np.clip(output, 0, 1) * 255).astype(np.uint8)).save(out_path)
            return f"Saved frame {frame}"
        except Exception as e:
            return f"Error processing frame {frame}: {e}"

    def _render(self, base: np.ndarray, points: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from patch_toon_tpu.ops.splat import splat_points

        n = len(points)
        bucket = _bucket(n)
        pts = np.zeros((bucket, 2), np.float32)
        pts[:n] = points[:, :2]
        colors = np.zeros((bucket, 3), np.float32)
        # per-index golden-ratio colors (reference get_unique_color, :214-221,
        # called with sequential indices at render time, :296)
        for i in range(n):
            colors[i] = golden_ratio_color(i)
        valid = np.zeros((bucket,), bool)
        valid[:n] = True
        out = splat_points(jnp.asarray(base), jnp.asarray(pts),
                           jnp.asarray(colors), jnp.asarray(valid),
                           self.sigma)
        return np.asarray(out)


def main() -> None:
    parser = argparse.ArgumentParser(description="Gaussian splat guide generator")
    parser.add_argument("--mask-dir", required=True)
    parser.add_argument("--flow-fwd-dir", required=True)
    parser.add_argument("--flow-bwd-dir", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--frame-first", type=int, required=True)
    parser.add_argument("--frame-last", type=int, required=True)
    parser.add_argument("--key-frames", type=int, nargs="+", required=True)
    parser.add_argument("--radius", type=float, default=10.0)
    parser.add_argument("--sigma", type=float, default=5.0)
    parser.add_argument("--file-format", default="%03d")
    parser.add_argument("--num-workers", type=int, default=None)
    parser.add_argument("--max-points", type=int, default=1000)
    args = parser.parse_args()

    GaussianFilter(
        mask_dir=args.mask_dir, flow_fwd_dir=args.flow_fwd_dir,
        flow_bwd_dir=args.flow_bwd_dir, output_dir=args.output_dir,
        frame_first=args.frame_first, frame_last=args.frame_last,
        key_frames=args.key_frames, radius=args.radius, sigma=args.sigma,
        file_format=args.file_format, num_workers=args.num_workers,
        max_points=args.max_points,
    ).process()


if __name__ == "__main__":
    main()
