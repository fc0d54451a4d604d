#!/usr/bin/env python
"""A/B the warp gather representation at full res (540x960, c=1).

The engine's tile gather showed fp32 gathers ride a slow TPU path and a
bit-exact u16 bitcast rides the fast 16-bit one (CLAUDE.md). dense_flow's
remaining cost is ~85% the per-iteration warp take (docs/perf/
lk_parts_r4.json) — test whether the same trick applies to jnp.take:

- f32      : shipped _quad_sample ((N,4) f32 table, one take)
- u16cast  : table bitcast to (N,8) uint16, take, bitcast back (BIT-exact)
- bf16     : (N,4) bf16 table (diagnostic only — value-changing; tells
             descriptor-count-bound vs byte-bound)

Methodology: distinct inputs per rep (anti-CSE), tiny-slice sync, median
of queued differences (CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
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
REPS = 24


def _sample_u16(quad_u16, h, w, c, ys, xs):
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    fy = (ys - y0f)[..., None]
    fx = (xs - x0f)[..., None]
    idx = (y0f.astype(jnp.int32) * (w + 1) + x0f.astype(jnp.int32)).reshape(-1)
    g16 = jnp.take(quad_u16, idx, axis=0)                     # (N, 8c) u16
    g = jax.lax.bitcast_convert_type(
        g16.reshape(-1, 4 * c, 2), jnp.float32)               # (N, 4c)
    g = g.reshape(ys.shape + (4, c))
    a, c0 = g[..., 0, :], g[..., 1, :]
    b, d = g[..., 2, :], g[..., 3, :]
    return (a * (1 - fx) + b * fx) * (1 - fy) \
        + (c0 * (1 - fx) + d * fx) * fy


def main():
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.random((H, W, 1), np.float32)) for _ in range(4)]
    flows = [jnp.asarray(rng.random((H, W, 2), np.float32) * 6 - 3)
             for _ in range(4)]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]

    @partial(jax.jit, static_argnames=("mode",), compiler_options=OPTS)
    def run(img, fl, mode):
        quad = F._quad_pack(img)
        ys, xs = gy + fl[..., 1], gx + fl[..., 0]
        if mode == "f32":
            out = F._quad_sample(quad, H, W, 1, ys, xs)
        elif mode == "u16cast":
            q16 = jax.lax.bitcast_convert_type(
                quad, jnp.uint16).reshape(quad.shape[0], -1)
            out = _sample_u16(q16, H, W, 1, ys, xs)
        else:  # bf16 diagnostic
            out = F._quad_sample(quad.astype(jnp.bfloat16), H, W, 1,
                                 ys.astype(jnp.bfloat16),
                                 xs.astype(jnp.bfloat16))
        return out

    # parity first: u16cast must be BIT-exact
    ref = np.asarray(run(imgs[0], flows[0], mode="f32"))
    alt = np.asarray(run(imgs[0], flows[0], mode="u16cast"))
    assert np.array_equal(ref, alt), np.abs(ref - alt).max()
    print("u16cast bit-exact: ok")

    results = {}
    for mode in ("f32", "u16cast", "bf16"):
        for i in range(4):  # warm every distinct input
            np.asarray(run(imgs[i], flows[i], mode=mode)[0, 0])
        diffs = []
        for _ in range(5):
            t0 = time.perf_counter()
            for r in range(REPS):
                o = run(imgs[r % 4], flows[r % 4], mode=mode)
            np.asarray(o[0, 0])
            t1 = time.perf_counter()
            for r in range(2 * REPS):
                o = run(imgs[r % 4], flows[r % 4], mode=mode)
            np.asarray(o[0, 0])
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / REPS * 1e3)
        results[mode] = round(float(np.median(diffs)), 3)
        print(f"{mode}: {results[mode]} ms")

    out = Path(REPO / "docs/perf/warp_bitcast_r4.json")
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
