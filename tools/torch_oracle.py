"""Straight-line torch reimplementation of the reference inference pipeline.

Implements, directly from the reference's behavior (never copying its code):
- mask binarize + threshold + 7x7 full-support erosion
  (reference generator.py:627-631, :327-351)
- tile positions from the eroded mask's nonzero walk (generator.py:353-398)
- the per-tile loop: center-padded crops, generator forward, Gaussian
  window (bilinearly resized on clipped boxes), top-left-anchored
  scatter-accumulate, weight normalization, mask composite
  (generator.py:427-565)
- uint8 conversion (generator.py:643-652)

Used as the PARITY ORACLE by tests/test_inference_e2e.py and as the
reference-semantics stylizer by tools/quality_harness.py. Runs the
reference's own torch modules (loaded read-only from /root/reference).
"""

from __future__ import annotations

import importlib.util
import pathlib
from typing import List, Tuple

import numpy as np
import torch
import torch.nn.functional as F
from PIL import Image

REFERENCE = pathlib.Path("/root/reference")


def load_reference_module(name: str):
    """Import a reference model file (torch-only imports) read-only."""
    path = REFERENCE / "src" / "models" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def eroded_mask(mask_img: Image.Image) -> torch.Tensor:
    """(1,H,W) binary tensor — generator.py:627-631 + :327-351."""
    m = mask_img.point(lambda p: p > 128 and 255).convert("L")
    t = torch.from_numpy(np.asarray(m, np.float32) / 255.0)[None]
    t[t < 0.4] = 0
    w = torch.ones((1, 1, 7, 7))
    conv = F.conv2d(t.unsqueeze(0), w, stride=1, padding=3)
    conv[conv < w.numel()] = 0
    conv /= w.numel()
    return conv.squeeze(0)


def patch_positions(eroded: torch.Tensor, patch_size: int,
                    overlap_percent: float = 30.0
                    ) -> List[Tuple[int, int, int, int]]:
    """generator.py:353-398."""
    stride = max(1, int(patch_size * (1 - overlap_percent / 100.0)))
    half = patch_size // 2
    h, w = eroded.shape[-2:]
    idx = eroded.squeeze().nonzero()
    used, out = set(), []
    for i in range(0, len(idx), stride):
        y, x = int(idx[i][0]), int(idx[i][1])
        key = (y // stride, x // stride)
        if key in used:
            continue
        used.add(key)
        out.append((max(0, y - half), min(h, y + half),
                    max(0, x - half), min(w, x + half)))
    return out


def stylize_frame(gen: "torch.nn.Module", frame11: np.ndarray,
                  eroded: torch.Tensor, patch_size: int,
                  overlap_percent: float = 30.0) -> np.ndarray:
    """Tiled stylization -> uint8 HWC (generator.py:427-565 + :643-652).

    frame11: (H,W,C) float32 in [-1,1]; C may exceed 3 (guide channels).
    """
    ps = patch_size
    x = torch.from_numpy(frame11).permute(2, 0, 1)[None]
    b, c, h, w = x.shape
    output = torch.zeros((b, 3, h, w))
    weights = torch.zeros((b, 1, h, w))
    mask = eroded[None]

    def ensure(patch):
        _, _, ph, pw = patch.shape
        if ph == ps and pw == ps:
            return patch
        new = torch.zeros((patch.size(0), patch.size(1), ps, ps))
        hc, wc = min(ph, ps), min(pw, ps)
        ho, wo = (ps - hc) // 2, (ps - wc) // 2
        new[:, :, ho:ho + hc, wo:wo + wc] = patch[:, :, :hc, :wc]
        return new

    for y0, y1, x0, x1 in patch_positions(eroded, ps, overlap_percent):
        patch = ensure(x[..., y0:y1, x0:x1])
        with torch.no_grad():
            out = gen(patch)
        ph, pw = y1 - y0, x1 - x0
        wy = torch.exp(-((torch.arange(ph) - ph / 2) ** 2 / (ph / 4) ** 2))
        wx = torch.exp(-((torch.arange(pw) - pw / 2) ** 2 / (pw / 4) ** 2))
        weight = (wy[:, None] * wx[None, :])[None, None]
        if weight.shape[-2:] != out.shape[-2:]:
            weight = F.interpolate(weight, size=out.shape[-2:],
                                   mode="bilinear", align_corners=False)
        hs = slice(y0, min(y0 + out.shape[2], h))
        ws = slice(x0, min(x0 + out.shape[3], w))
        output[..., hs, ws] += (out[..., :hs.stop - hs.start,
                                    :ws.stop - ws.start]
                                * weight[..., :hs.stop - hs.start,
                                         :ws.stop - ws.start])
        weights[..., hs, ws] += weight[..., :hs.stop - hs.start,
                                       :ws.stop - ws.start]

    valid = weights > 1e-8
    output = output / weights.repeat(1, 3, 1, 1).where(
        valid, torch.ones_like(weights))
    output = x[:, :3] * (1 - mask) + output * mask
    output = output.float().clamp(-1, 1)
    u8 = ((output + 1) * 127.5).clamp(0, 255).permute(0, 2, 3, 1)
    return u8.round().numpy()[0].astype(np.uint8)
