#!/usr/bin/env python
"""Generate a synthetic sample scene so the quickstart runs out of the box.

The reference ships hand-made sample sequences (test_dataset/); this build
generates an equivalent scene structure on demand instead of vendoring
binary assets: N frames of textured background with moving shapes, a
"stylized" target (posterized + edge-tinted), masks, and tracking textures.

    python tools/make_sample_scene.py sample_scene --frames 7 --height 270 --width 480
"""

from __future__ import annotations

import argparse
import colorsys
from pathlib import Path

import numpy as np
from PIL import Image


def _background(rng, h, w):
    base = rng.random((h // 8 + 1, w // 8 + 1, 3)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8, 1), np.float32))[:h, :w]
    return (img * 0.4 + 0.25)


def _stylize(frame: np.ndarray) -> np.ndarray:
    """A deterministic 'hand stylization': posterize + warm tint."""
    post = np.round(frame * 4) / 4
    tint = np.array([1.15, 0.95, 0.8], np.float32)
    return np.clip(post * tint, 0, 1)


def make_scene(out_dir: str, frames: int = 7, height: int = 270,
               width: int = 480, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    out = Path(out_dir)
    for sub in ("input", "output", "mask", "tracking"):
        (out / sub).mkdir(parents=True, exist_ok=True)

    bg = _background(rng, height, width)
    n_blobs = 5
    centers = rng.random((n_blobs, 2)) * [height * 0.6, width * 0.6] \
        + [height * 0.2, width * 0.2]
    velocity = rng.standard_normal((n_blobs, 2)) * 3.0
    radii = rng.random(n_blobs) * 18 + 14
    colors = np.array([colorsys.hsv_to_rgb((i * 0.618) % 1, 0.7, 0.9)
                       for i in range(n_blobs)], np.float32)

    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    for f in range(frames):
        frame = bg.copy()
        mask = np.zeros((height, width), np.float32)
        track = bg.copy() * 0.2
        for b in range(n_blobs):
            cy, cx = centers[b] + velocity[b] * f
            d2 = (ys - cy) ** 2 + (xs - cx) ** 2
            inside = d2 < radii[b] ** 2
            soft = np.exp(-d2 / (radii[b] ** 2))
            frame = frame * (1 - soft[..., None]) \
                + colors[b] * soft[..., None]
            mask[inside] = 1.0
            # tracking texture: stable per-blob color block
            track[inside] = colors[(b + 2) % n_blobs]

        name = f"{f + 1:03d}.png"
        Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8)).save(
            out / "input" / name)
        Image.fromarray((_stylize(frame) * 255).astype(np.uint8)).save(
            out / "output" / name)
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            out / "mask" / name)
        Image.fromarray((np.clip(track, 0, 1) * 255).astype(np.uint8)).save(
            out / "tracking" / name)
    print(f"Wrote {frames} frames to {out}/(input|output|mask|tracking)")


def main() -> None:
    parser = argparse.ArgumentParser(description="Synthetic sample scene")
    parser.add_argument("out_dir")
    parser.add_argument("--frames", type=int, default=7)
    parser.add_argument("--height", type=int, default=270)
    parser.add_argument("--width", type=int, default=480)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    make_scene(args.out_dir, args.frames, args.height, args.width, args.seed)


if __name__ == "__main__":
    main()
