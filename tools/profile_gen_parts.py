#!/usr/bin/env python
"""Attribute the generator's non-conv overhead: time architecture ablations.

Per-conv microbenchmarks sum to ~76 us/tile but the full generator runs at
~97-124 us/tile; this script times generator variants (dropping one
architectural piece at a time) with dispatch-difference timing to find where
the remaining ~25-48 us/tile goes.

Usage: python tools/profile_gen_parts.py [bucket] [N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.models import GeneratorJ

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N = int(sys.argv[2]) if len(sys.argv) > 2 else 12
PS, C = 80, 6
DT = jnp.bfloat16


def measure(name, fn, sets):
    def timed(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(sets[i % 3])
        np.asarray(out).ravel()[:8]
        return time.perf_counter() - t0

    np.asarray(fn(sets[0])).ravel()[:8]  # compile+warm
    dt = (timed(2 * N) - timed(N)) / N
    print(f"{name:42s} {dt * 1e3:8.2f} ms  {dt * 1e6 / B:6.1f} us/tile",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    sets = [jnp.asarray(rng.random((B, PS, PS, C), np.float32) * 2 - 1, DT)
            for _ in range(3)]
    variants = [
        ("full (smoothers+tanh+7res)", dict()),
        ("no smoothers", dict(append_smoothers=False)),
        ("no tanh", dict(tanh=False)),
        ("resnet_blocks=0", dict(resnet_blocks=0)),
        ("resnet_blocks=3", dict(resnet_blocks=3)),
        ("norm_layer=None", dict(norm_layer=None)),
    ]
    base = dict(input_channels=C, use_bias=True, tanh=True,
                append_smoothers=True, resnet_blocks=7,
                filters=(32, 64, 128, 128, 128, 64),
                norm_layer="instance_norm", dtype=DT)
    for name, delta in variants:
        cfg = {**base, **delta}
        gen = GeneratorJ(**cfg)
        g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))
        fn = jax.jit(lambda t, g=gen, v=g_vars: g.apply(v, t, train=False))
        measure(name, fn, sets)


if __name__ == "__main__":
    main()
