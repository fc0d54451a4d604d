#!/usr/bin/env python
"""Time the warp/LK primitives on the chip: warp_image, dense_flow (s1/s2),
and the fused temporal prologue (_temporal_device_flow + _temporal_prep).

Used to evaluate gather formulations of ops.flow._bilinear_take — the
gathers are DESCRIPTOR-bound on TPU (r3: pre-pairing +x neighbors halved
descriptors for 2.1x; r4: pairing +y rows as well fetches all four bilinear
taps in ONE take). Methodology: distinct inputs per dispatch (anti-CSE),
tiny-slice sync, median of queued-run differences (CLAUDE.md).

Usage: python tools/profile_warp.py [--h 540] [--w 960] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from patch_toon_tpu.infer.temporal import (  # noqa: E402
    _temporal_device_flow,
    _temporal_prep,
)
from patch_toon_tpu.ops.flow import dense_flow, warp_image  # noqa: E402
from patch_toon_tpu.utils.xla_options import resolve_xla_options  # noqa: E402

OPTS = resolve_xla_options("auto")


def diff_time(fns, sync, n_short, n_long, reps):
    diffs = []
    for _ in range(reps):
        ts = []
        for n in (n_short, n_long):
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = fns[i % len(fns)]()
            np.asarray(sync(out))
            ts.append(time.perf_counter() - t0)
        diffs.append((ts[1] - ts[0]) / (n_long - n_short))
    return float(np.median(diffs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=540)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tag", default="current")
    ap.add_argument("--out", default=str(REPO / "docs" / "perf" /
                                         "warp_r4.json"))
    args = ap.parse_args()
    h, w = args.h, args.w
    rng = np.random.default_rng(0)
    N = 8
    imgs = jnp.asarray(rng.random((N, h, w, 3)).astype(np.float32) * 2 - 1)
    flows = jnp.asarray(
        (rng.random((N, h, w, 2)).astype(np.float32) - 0.5) * 8)
    frames_u8 = jnp.asarray(
        rng.integers(0, 255, (N, h, w, 3), dtype=np.uint8))
    grays = jnp.asarray(rng.integers(0, 255, (N, h, w), dtype=np.uint8))

    res = {"tag": args.tag, "h": h, "w": w}

    wfn = jax.jit(warp_image, compiler_options=OPTS)
    np.asarray(wfn(imgs[0], flows[0])[0, 0])
    t = diff_time([lambda i=i: wfn(imgs[i], flows[i]) for i in range(N)],
                  lambda o: o[0, 0], 6, 18, args.reps)
    res["warp_image_ms"] = round(t * 1e3, 2)
    print(f"warp_image: {t * 1e3:.2f} ms", flush=True)

    for s in (1, 2):
        ffn = jax.jit(lambda a, b, s=s: dense_flow(a, b, scale=s),
                      compiler_options=OPTS)
        g = grays.astype(jnp.float32) / 255.0
        np.asarray(ffn(g[0], g[1])[0, 0])
        t = diff_time([lambda i=i: ffn(g[i], g[(i + 1) % N])
                       for i in range(N)],
                      lambda o: o[0, 0], 4, 12, args.reps)
        res[f"dense_flow_s{s}_ms"] = round(t * 1e3, 2)
        print(f"dense_flow s{s}: {t * 1e3:.2f} ms", flush=True)

    # full chain prologue: device flow + fused prep (what the temporal
    # serving chain pays per frame before the generator)
    def prologue(i, s):
        fl, gr = _temporal_device_flow(frames_u8[i], grays[i], None, s)
        return _temporal_prep(frames_u8[i], imgs[i], fl, 3)

    for s in (1, 2):
        np.asarray(prologue(0, s)[0, 0, 0])
        t = diff_time([lambda i=i, s=s: prologue(i, s) for i in range(N)],
                      lambda o: o[0, 0, 0], 4, 12, args.reps)
        res[f"prologue_s{s}_ms"] = round(t * 1e3, 2)
        print(f"flow+prep prologue s{s}: {t * 1e3:.2f} ms", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    hist = []
    if out.exists():
        hist = json.loads(out.read_text())
        if isinstance(hist, dict):
            hist = [hist]
    hist.append(res)
    out.write_text(json.dumps(hist, indent=1))
    print(f"appended -> {out}", flush=True)


if __name__ == "__main__":
    main()
