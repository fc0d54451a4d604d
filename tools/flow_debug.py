#!/usr/bin/env python
"""Flow debug overlays: arrows showing where pixels move between frames.

Behavioral spec (mirrors reference tools/flow_debug.py at the output level):
for each consecutive frame pair (i, i+1) with a flow field ``{i}.npy``,
write one PNG showing the flow as a sparse grid of arrows drawn over a
50/50 blend of the two frames, so a wrong flow direction or magnitude is
visible at a glance.

This implementation renders with PIL directly — the overlay is the SAME
resolution as the frames (matplotlib's figure/dpi pipeline resamples and
letterboxes), arrows are antialiased lines with solid heads, and arrow
color encodes flow magnitude (yellow = small, red = large) which the
reference's constant-red quiver can't show. No matplotlib dependency.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def sample_flow_grid(flow: np.ndarray, grid: int):
    """Average the flow over grid x grid cells -> (cy, cx, u, v) arrays.

    Cell-mean sampling (not nearest-point like a naive quiver) so a single
    noisy pixel can't flip an arrow; cells are anchored at their centers.
    """
    h, w = flow.shape[:2]
    ys = np.arange(grid // 2, h, grid)
    xs = np.arange(grid // 2, w, grid)
    cy, cx, us, vs = [], [], [], []
    for y in ys:
        y0, y1 = max(0, y - grid // 2), min(h, y + grid // 2 + 1)
        for x in xs:
            x0, x1 = max(0, x - grid // 2), min(w, x + grid // 2 + 1)
            cell = flow[y0:y1, x0:x1]
            cy.append(y)
            cx.append(x)
            us.append(float(cell[..., 0].mean()))
            vs.append(float(cell[..., 1].mean()))
    return (np.array(cy), np.array(cx), np.array(us), np.array(vs))


def render_flow_overlay(img1: np.ndarray, img2: np.ndarray,
                        flow: np.ndarray, grid: int = 20,
                        scale: float = 1.0) -> np.ndarray:
    """Pure function: two RGB uint8 frames + flow (H,W,2) -> overlay RGB.

    The base is the frames' 50/50 blend (ghosting shows the true motion the
    arrows should match). Arrows start at cell centers and span the cell's
    mean displacement * scale; magnitude is color-coded yellow->red.
    """
    base = ((img1.astype(np.uint16) + img2.astype(np.uint16)) // 2
            ).astype(np.uint8)
    im = Image.fromarray(base).convert("RGB")
    draw = ImageDraw.Draw(im)
    cy, cx, us, vs = sample_flow_grid(flow, grid)
    mags = np.hypot(us, vs)
    vmax = max(float(mags.max()), 1e-6)
    for y, x, u, v, m in zip(cy, cx, us, vs, mags):
        dx, dy = u * scale, v * scale
        x1, y1 = x + dx, y + dy
        t = m / vmax
        color = (255, int(round(255 * (1.0 - t * 0.8))), 0)
        draw.line([(x, y), (x1, y1)], fill=color, width=1)
        # arrowhead: two short back-strokes at +-30 degrees
        if m * scale >= 1.0:
            ang = np.arctan2(dy, dx)
            hl = min(6.0, 2.0 + m * scale * 0.25)
            for da in (np.pi * 5 / 6, -np.pi * 5 / 6):
                draw.line([(x1, y1),
                           (x1 + hl * np.cos(ang + da),
                            y1 + hl * np.sin(ang + da))],
                          fill=color, width=1)
        else:
            # near-zero flow: a dot, so static regions stay legible
            draw.point([(x, y)], fill=color)
    return np.asarray(im)


def _open_frame(input_dir: Path, idx: int):
    for ext in (".png", ".jpg", ".jpeg"):
        p = input_dir / f"{idx:03d}{ext}"
        if p.exists():
            return np.asarray(Image.open(p).convert("RGB"))
    return None


def visualize_pairs(input_dir, flow_dir, output_dir, frame_start=1,
                    frame_end=None, skip_frames=1, flow_scale=1.0,
                    grid_size=20) -> int:
    """Render every (frame, frame+1) overlay in the range; returns count.

    frame_end defaults to the largest numbered .npy present; a pair whose
    frame, successor, or flow file is missing is reported and skipped
    (per-file resilience like the inference pipeline).
    """
    input_dir, flow_dir = Path(input_dir), Path(flow_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    if frame_end is None:
        nums = [int(f.stem) for f in flow_dir.glob("*.npy")
                if f.stem.isdigit()]
        if not nums:
            raise ValueError(f"No flow files found in {flow_dir}")
        frame_end = max(nums)
    done = 0
    for idx in range(frame_start, frame_end + 1, skip_frames):
        a = _open_frame(input_dir, idx)
        b = _open_frame(input_dir, idx + 1)
        fp = flow_dir / f"{idx:03d}.npy"
        if a is None or b is None or not fp.exists():
            print(f"Skipped frame {idx} (missing frame or flow)")
            continue
        overlay = render_flow_overlay(a, b, np.load(str(fp)),
                                      grid=grid_size, scale=flow_scale)
        Image.fromarray(overlay).save(output_dir / f"flow_{idx:03d}.png")
        done += 1
    print(f"Wrote {done} flow overlays to {output_dir}")
    return done


class FlowDebugVisualizer:
    """Thin object wrapper kept for API compatibility; the implementation
    is the functional pipeline above."""

    def __init__(self, input_dir, flow_dir, output_dir, frame_start=1,
                 frame_end=None, skip_frames=1, flow_scale=1.0,
                 grid_size=20):
        self.kwargs = dict(
            input_dir=input_dir, flow_dir=flow_dir, output_dir=output_dir,
            frame_start=frame_start, frame_end=frame_end,
            skip_frames=skip_frames, flow_scale=flow_scale,
            grid_size=grid_size)

    def visualize_all(self) -> None:
        visualize_pairs(**self.kwargs)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input_dir")
    p.add_argument("flow_dir")
    p.add_argument("output_dir")
    p.add_argument("--start", type=int, default=1)
    p.add_argument("--end", type=int)
    p.add_argument("--skip", type=int, default=1)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--grid", type=int, default=20)
    a = p.parse_args()
    visualize_pairs(a.input_dir, a.flow_dir, a.output_dir, a.start, a.end,
                    a.skip, a.scale, a.grid)


if __name__ == "__main__":
    main()
