#!/usr/bin/env python
"""Attribute dense_flow's cost across its components (gather vs conv vs
elementwise) WITHOUT changing values — ablated program variants are timed
only to locate the bottleneck (CLAUDE.md methodology: distinct inputs,
tiny-slice sync, median of queued differences).

Variants (each a full 4-level pyramid, 4 iters):
- full        : shipped dense_flow
- no_warp     : warp replaced by i2 itself (kills the per-iter gather)
- no_sums     : grouped window conv replaced by identity (kills the convs)
- no_solve    : 2x2 solve replaced by bx/by passthrough

Usage: python tools/profile_lk_parts.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from patch_toon_tpu.ops import flow as F  # noqa: E402
from patch_toon_tpu.utils.xla_options import resolve_xla_options  # noqa: E402

OPTS = resolve_xla_options("auto")
H, W = 540, 960


def variant(kind):
    def lk_refine(i1, i2, fl, window, iters, eps):
        h, w = i2.shape
        quad = F._quad_pack(i2[..., None])
        gy = jnp.arange(h, dtype=fl.dtype)[:, None]
        gx = jnp.arange(w, dtype=fl.dtype)[None, :]

        def one_iter(fl, _):
            if kind == "no_warp":
                warped = i2 + fl[..., 0] * 1e-9  # keep the dependency
            else:
                warped = F._quad_sample(
                    quad, h, w, 1, gy + fl[..., 1], gx + fl[..., 0])[..., 0]
            ix, iy = F._gradients(warped)
            it = warped - i1
            stacked = jnp.stack(
                [ix * ix, ix * iy, iy * iy, ix * it, iy * it], axis=-1)
            s = stacked if kind == "no_sums" else F._box_filter(
                stacked, window)
            axx = s[..., 0] + eps
            axy = s[..., 1]
            ayy = s[..., 2] + eps
            bx = -s[..., 3]
            by = -s[..., 4]
            if kind == "no_solve":
                du, dv = bx, by
            else:
                det = axx * ayy - axy * axy
                du = (ayy * bx - axy * by) / det
                dv = (axx * by - axy * bx) / det
            du = jnp.clip(du, -window, window)
            dv = jnp.clip(dv, -window, window)
            return fl + jnp.stack([du, dv], axis=-1), None

        fl, _ = jax.lax.scan(one_iter, fl, None, length=iters)
        return fl

    def df(img1, img2):
        pyr = [(img1, img2)]
        for _ in range(3):
            a, b = pyr[-1]
            if min(a.shape) // 2 < max(8, 15):
                break
            pyr.append((F._downsample2(a), F._downsample2(b)))
        a, b = pyr[-1]
        fl = jnp.zeros((*a.shape, 2), jnp.float32)
        for level in range(len(pyr) - 1, -1, -1):
            a, b = pyr[level]
            if fl.shape[:2] != a.shape:
                fl = 2.0 * jax.image.resize(fl, (*a.shape, 2),
                                            method="bilinear")
            fl = lk_refine(a, b, fl, 15, 4, 1e-4)
        return fl

    return jax.jit(df, compiler_options=OPTS)


def main():
    rng = np.random.default_rng(0)
    N = 8
    g = jnp.asarray(rng.random((N, H, W)).astype(np.float32))
    res = {}
    for kind in ("full", "no_warp", "no_sums", "no_solve"):
        fn = variant(kind)
        np.asarray(fn(g[0], g[1])[0, 0])
        diffs = []
        for _ in range(5):
            ts = []
            for n in (4, 12):
                t0 = time.perf_counter()
                out = None
                for i in range(n):
                    out = fn(g[i % N], g[(i + 1) % N])
                np.asarray(out[0, 0])
                ts.append(time.perf_counter() - t0)
            diffs.append((ts[1] - ts[0]) / 8)
        ms = float(np.median(diffs)) * 1e3
        res[kind] = round(ms, 2)
        print(f"{kind}: {ms:.2f} ms", flush=True)
    print("attribution: warp ~", round(res["full"] - res["no_warp"], 2),
          "ms; sums ~", round(res["full"] - res["no_sums"], 2),
          "ms; solve ~", round(res["full"] - res["no_solve"], 2), "ms",
          flush=True)
    out = REPO / "docs" / "perf" / "lk_parts_r4.json"
    out.write_text(json.dumps(res, indent=1))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
