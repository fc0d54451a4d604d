#!/usr/bin/env python
"""Hardened re-measurement of generator tile-rate vs batch bucket.

The r1/r2 finding "non-pow2 buckets are PATHOLOGICAL (144-240: 163-228
us/tile vs ~97-114 at 128/256)" was measured with whole-output-fetch
window timing, which tools/profile_quant.py later showed can be swamped by
tunnel-transport noise. This sweep re-measures with the hardened
estimator (device-side-slice sync, median of differences) under the
shipped tuned XLA options, because infer/tiling.bucket_size's pow2-only
policy (and frames_per_dispatch's bucket-filling choice) rests on it.

Usage: python tools/profile_buckets.py [buckets...]
Writes docs/perf/bucket_sweep_r3.json.
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
from patch_toon_tpu.utils.xla_options import resolve_xla_options

N = 12
PS, C = 80, 6
DEFAULT = [128, 160, 192, 224, 256, 384, 512]


def measure(name, fn, sets, b):
    def timed(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(sets[i % 3])
        np.asarray(out[0, 0, 0])
        return time.perf_counter() - t0

    np.asarray(fn(sets[0])[0, 0, 0])
    timed(2)
    dt = float(np.median([(timed(2 * N) - timed(N)) / N for _ in range(3)]))
    print(f"{name:14s} {dt * 1e3:8.2f} ms  {dt * 1e6 / b:6.1f} us/tile",
          flush=True)
    return dt


def main():
    buckets = [int(a) for a in sys.argv[1:]] or DEFAULT
    rng = np.random.default_rng(0)
    gen = GeneratorJ(input_channels=C, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64),
                     norm_layer="instance_norm", dtype=jnp.bfloat16)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))
    opts = resolve_xla_options("auto")
    out = {}
    for b in buckets:
        sets = [jnp.asarray(rng.random((b, PS, PS, C), np.float32) * 2 - 1,
                            jnp.bfloat16) for _ in range(3)]
        fn = jax.jit(lambda t: gen.apply(g_vars, t, train=False),
                     compiler_options=opts)
        out[b] = measure(f"B={b}", fn, sets, b) * 1e6 / b
        del sets
    path = Path(__file__).resolve().parents[1] / \
        "docs/perf/bucket_sweep_r3.json"
    path.write_text(json.dumps(
        {"us_per_tile": out, "ps": PS, "n": N, "options": "auto"},
        indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
