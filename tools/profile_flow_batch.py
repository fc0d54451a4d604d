#!/usr/bin/env python
"""Measure batched (vmapped) LK dense_flow vs per-pair dispatches.

VERDICT r3 #1: the temporal chain's bottleneck is `_temporal_device_flow`
running once per frame on the sequential chain (single-stream) and once per
STREAM per cycle (multi-stream). Backward flow depends only on input-frame
grays, so flows are precomputable and batchable — IF a vmapped dense_flow
over K pairs is cheaper per pair than K dispatches. This tool measures that
on the real chip and checks bitwise agreement between the two formulations.

Methodology (CLAUDE.md): distinct random inputs per dispatch (anti-CSE /
anti-hoist), sync via np.asarray on a small device-side slice (never
block_until_ready through the axon tunnel), and median of differences
between two queued run lengths to cancel fixed dispatch+transport cost.

Usage: python tools/profile_flow_batch.py [--h 540] [--w 960] [--reps 5]
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

from patch_toon_tpu.ops.flow import dense_flow  # noqa: E402
from patch_toon_tpu.utils.xla_options import resolve_xla_options  # noqa: E402

OPTS = resolve_xla_options("auto")


def timed_queue(fns, sync_slice, n_short, n_long, reps):
    """Median over reps of (T(n_long) - T(n_short)) / (n_long - n_short)
    where each T queues that many dispatches and syncs once on a tiny
    fetch of the LAST output."""
    diffs = []
    for _ in range(reps):
        ts = []
        for n in (n_short, n_long):
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = fns[i % len(fns)]()
            np.asarray(sync_slice(out))
            ts.append(time.perf_counter() - t0)
        diffs.append((ts[1] - ts[0]) / (n_long - n_short))
    return float(np.median(diffs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=540)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=str(REPO / "docs" / "perf" /
                                         "flow_batch_r4.json"))
    args = ap.parse_args()
    h, w = args.h, args.w
    rng = np.random.default_rng(0)

    # distinct gray pairs per dispatch so XLA can't CSE/hoist anything;
    # mild correlation between the two frames like real video
    N_POOL = 12
    base = rng.uniform(0, 1, (N_POOL + 1, h, w)).astype(np.float32)
    grays = jnp.asarray(0.7 * base[:-1] + 0.3 * base[1:])
    grays2 = jnp.asarray(base[:-1])

    results = {"h": h, "w": w, "device": str(jax.devices()[0])}

    single = {}
    for scale in (1, 2):
        fn = jax.jit(lambda a, b, s=scale: dense_flow(a, b, scale=s),
                     compiler_options=OPTS)
        # warm
        np.asarray(fn(grays[0], grays2[0])[0, 0])
        fns = [(lambda i=i, f=fn: f(grays[i], grays2[i]))
               for i in range(N_POOL)]
        t = timed_queue(fns, lambda o: o[0, 0], 4, 12, args.reps)
        single[scale] = t
        results[f"single_ms_s{scale}"] = round(t * 1e3, 2)
        print(f"single dispatch, scale={scale}: {t * 1e3:.1f} ms/flow",
              flush=True)

    for scale in (1, 2):
        for K in (2, 3, 4, 6, 8):
            bfn = jax.jit(
                lambda a, b, s=scale: jax.vmap(
                    lambda x, y: dense_flow(x, y, scale=s))(a, b),
                compiler_options=OPTS)
            packs = []
            for j in range(max(2, N_POOL // K)):
                idx = [(j * K + t) % N_POOL for t in range(K)]
                packs.append((grays[jnp.asarray(idx)],
                              grays2[jnp.asarray(idx)]))
            np.asarray(bfn(*packs[0])[0, 0, 0])  # warm
            fns = [(lambda p=p, f=bfn: f(*p)) for p in packs]
            t = timed_queue(fns, lambda o: o[0, 0, 0], 3, 9, args.reps)
            per = t / K
            results[f"batch{K}_ms_s{scale}"] = round(t * 1e3, 2)
            results[f"batch{K}_per_flow_ms_s{scale}"] = round(per * 1e3, 2)
            print(f"batch K={K}, scale={scale}: {t * 1e3:.1f} ms/dispatch "
                  f"= {per * 1e3:.1f} ms/flow "
                  f"({single[scale] / per:.2f}x vs single)", flush=True)

    # bitwise agreement: vmapped vs per-pair on the SAME inputs
    for scale in (1, 2):
        bfn = jax.jit(
            lambda a, b, s=scale: jax.vmap(
                lambda x, y: dense_flow(x, y, scale=s))(a, b),
            compiler_options=OPTS)
        K = 4
        a, b = grays[:K], grays2[:K]
        batched = np.asarray(bfn(a, b))
        sfn = jax.jit(lambda x, y, s=scale: dense_flow(x, y, scale=s),
                      compiler_options=OPTS)
        singles = np.stack([np.asarray(sfn(a[i], b[i])) for i in range(K)])
        exact = bool((batched == singles).all())
        maxd = float(np.abs(batched - singles).max())
        results[f"bitwise_equal_s{scale}"] = exact
        results[f"max_abs_diff_s{scale}"] = maxd
        print(f"scale={scale}: batched == per-pair bitwise: {exact} "
              f"(max |d| = {maxd:.3e})", flush=True)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
