#!/usr/bin/env python
"""Interleaved A/B of XLA compiler-option candidates for the generator.

Single timing windows on this shared TPU swing +/-2x (see
docs/perf/xla_sweep.json: the SAME compiled default program measured
99-217 us/tile across one sweep). This interleaves candidate measurements
round-robin over many rounds and compares per-program MINIMA — the
contention-free estimate — and verifies each candidate's outputs match the
default compile bitwise (compiler options must not change numerics).

Usage: python tools/ab_xla_flags.py [bucket] [rounds] [--json out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.models import GeneratorJ

args = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(args[0]) if len(args) > 0 else 512
ROUNDS = int(args[1]) if len(args) > 1 else 10
JSON_OUT = None
if "--json" in sys.argv:
    JSON_OUT = sys.argv[sys.argv.index("--json") + 1]
PS, C, N = 80, 6, 8
DT = jnp.bfloat16

CANDIDATES = [
    ("default", {}),
    ("vmem_24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
]


def main():
    rng = np.random.default_rng(0)
    sets = [jnp.asarray(rng.random((B, PS, PS, C), np.float32) * 2 - 1, DT)
            for _ in range(3)]
    gen = GeneratorJ(input_channels=C, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64),
                     norm_layer="instance_norm", dtype=DT)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))

    lowered = jax.jit(lambda t: gen.apply(g_vars, t, train=False)).lower(
        jax.ShapeDtypeStruct((B, PS, PS, C), DT))
    fns = []
    for label, opts in CANDIDATES:
        fn = lowered.compile(compiler_options=opts) if opts \
            else lowered.compile()
        fns.append((label, fn))

    # correctness: every candidate must match the default compile
    ref = np.asarray(fns[0][1](sets[0]))
    for label, fn in fns[1:]:
        got = np.asarray(fn(sets[0]))
        same = np.array_equal(ref, got)
        close = np.allclose(ref.astype(np.float32), got.astype(np.float32),
                            atol=1e-2)
        print(f"{label:12s} bitwise={same} close={close}", flush=True)
        assert close, f"{label} output diverges from default compile"

    def window(fn):
        # Fetch a 4-byte device-side sum instead of the 9.8MB output: the
        # tunnel's transport time varies by hundreds of ms per fetch, which
        # swamps the dispatch-difference. The sum is dispatched after the
        # queued generator calls, so fetching it drains the whole stream.
        def timed(k):
            out = None
            t0 = time.perf_counter()
            for i in range(k):
                out = fn(sets[i % 3])
            float(jnp.sum(out[0, 0, 0]))
            return time.perf_counter() - t0

        return (timed(2 * N) - timed(N)) / N

    for _, fn in fns:  # warm
        np.asarray(fn(sets[0])).ravel()[:8]

    order_rng = np.random.default_rng(1)
    times = {label: [] for label, _ in fns}
    for r in range(ROUNDS):
        idx = order_rng.permutation(len(fns))
        for i in idx:
            label, fn = fns[i]
            times[label].append(window(fn))
        best = {lb: min(ts) * 1e6 / B for lb, ts in times.items()}
        print(f"round {r}: " + "  ".join(
            f"{lb}={v:.1f}" for lb, v in best.items()) + " us/tile(min)",
            flush=True)

    summary = {lb: {"min_us_per_tile": min(ts) * 1e6 / B,
                    "median_us_per_tile":
                        float(np.median(ts)) * 1e6 / B,
                    "windows": [t * 1e3 for t in ts]}
               for lb, ts in times.items()}
    for lb, s in summary.items():
        print(f"{lb:12s} min {s['min_us_per_tile']:6.1f}  "
              f"median {s['median_us_per_tile']:6.1f} us/tile")
    if JSON_OUT:
        Path(JSON_OUT).parent.mkdir(parents=True, exist_ok=True)
        Path(JSON_OUT).write_text(json.dumps(
            {"bucket": B, "rounds": ROUNDS, "summary": summary}, indent=1))
        print(f"wrote {JSON_OUT}")


if __name__ == "__main__":
    main()
