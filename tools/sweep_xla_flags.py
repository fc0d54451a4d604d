#!/usr/bin/env python
"""Sweep XLA compiler options for the generator tile-batch program.

XLA's fusion choices at the generator's shapes are a compilation lottery
(see CLAUDE.md: removing model pieces makes it SLOWER; non-pow2 batches are
pathological). This sweeps per-compile compiler options (no process restart
needed — jit(...).lower(...).compile(compiler_options=...)) and measures
us/tile with dispatch-difference timing, re-measuring the default build
between variants so host-contention drift is visible.

Usage: python tools/sweep_xla_flags.py [bucket] [N] [--json out.json]
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
N = int(args[1]) if len(args) > 1 else 12
JSON_OUT = None
if "--json" in sys.argv:
    JSON_OUT = sys.argv[sys.argv.index("--json") + 1]
PS, C = 80, 6
DT = jnp.bfloat16

# Each entry: (label, {option: value}). Values are strings per PJRT.
VARIANTS = [
    ("default", {}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("no_lhs", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("licm_2x", {"xla_tpu_licm_size_inflation_ratio": "2"}),
    ("no_multi_output_fusion", {"xla_tpu_enable_multi_output_fusion": "false"}),
    ("async_done_latency", {"xla_latency_hiding_scheduler_rerun": "2"}),
    ("flash_vmem", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
]


def build_fn(gen, g_vars, opts):
    def f(t):
        return gen.apply(g_vars, t, train=False)

    lowered = jax.jit(f).lower(
        jax.ShapeDtypeStruct((B, PS, PS, C), DT))
    if opts:
        return lowered.compile(compiler_options=opts)
    return lowered.compile()


def measure(fn, sets, n):
    def timed(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(sets[i % 3])
        np.asarray(out).ravel()[:8]
        return time.perf_counter() - t0

    np.asarray(fn(sets[0])).ravel()[:8]  # warm
    return (timed(2 * n) - timed(n)) / n


def main():
    rng = np.random.default_rng(0)
    sets = [jnp.asarray(rng.random((B, PS, PS, C), np.float32) * 2 - 1, DT)
            for _ in range(3)]
    gen = GeneratorJ(input_channels=C, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64),
                     norm_layer="instance_norm", dtype=DT)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))

    base_fn = build_fn(gen, g_vars, {})
    results = []

    def record(label, fn):
        try:
            dt = measure(fn, sets, N)
        except Exception as e:  # noqa: BLE001
            print(f"{label:26s} FAILED: {e}", flush=True)
            results.append({"label": label, "error": str(e)[:200]})
            return
        print(f"{label:26s} {dt * 1e3:8.2f} ms  {dt * 1e6 / B:6.1f} us/tile",
              flush=True)
        results.append({"label": label, "ms": dt * 1e3,
                        "us_per_tile": dt * 1e6 / B})

    for label, opts in VARIANTS:
        if label != "default":
            # interleave a default re-measurement to expose drift
            record("default(recheck)", base_fn)
        try:
            fn = build_fn(gen, g_vars, opts)
        except Exception as e:  # noqa: BLE001
            print(f"{label:26s} COMPILE FAILED: {e}", flush=True)
            results.append({"label": label, "error": str(e)[:200]})
            continue
        record(label, fn)

    if JSON_OUT:
        Path(JSON_OUT).parent.mkdir(parents=True, exist_ok=True)
        Path(JSON_OUT).write_text(json.dumps(
            {"bucket": B, "n": N, "results": results}, indent=1))
        print(f"wrote {JSON_OUT}")


if __name__ == "__main__":
    main()
