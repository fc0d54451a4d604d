#!/usr/bin/env python
"""Why does 32_fast (fp32 tensors, 3-pass bf16 convs) beat plain bf16?

VERDICT r4 weak #3: docs/perf/fp32_modes_r4.json measured the full tiled
engine program at bf16 = 49.0 ms/frame vs 32_fast = 39.8 — an inversion
(3 conv passes beating 1) that says the shipped default leaves ~20% on
the table somewhere outside the MXU.

This tool isolates where, on the BARE generator (anti-CSE methodology of
tools/profile_buckets.py: 3 distinct input sets round-robin, device-side
slice sync, median of dispatch differences) under the shipped tuned XLA
options, at the chain bucket (256) and the multiframe bucket (512):

- bf16            : shipped default (dtype=bf16, convs DEFAULT)
- 32_fast         : fp32 tensors, convs HIGH (3-pass)  [the inversion arm]
- 32_convdefault  : fp32 tensors, convs DEFAULT (1-pass bf16) — if this is
                    fast, fp32 *layout/IN* is not the cost and bf16's gap
                    is in its own graph
- bf16_in_bf16    : bf16 with InstanceNorm stats kept in bf16 (monkeypatch;
                    NOT value-correct, measurement-only) — isolates the
                    per-norm bf16->fp32->bf16 cast round trips
- bf16_highconv   : bf16 tensors but convs HIGH — controls whether the
                    3-pass conv decomposition itself changes fusion shape

Writes docs/perf/bf16_inversion_r5.json.
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
from patch_toon_tpu.models import layers as L
from patch_toon_tpu.utils.xla_options import resolve_xla_options

N = 12
PS, C = 80, 6
GEN_KW = dict(input_channels=C, use_bias=True, tanh=True,
              append_smoothers=True, resnet_blocks=7,
              filters=(32, 64, 128, 128, 128, 64),
              norm_layer="instance_norm")


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
    print(f"{name:18s} B={b:4d} {dt * 1e3:8.2f} ms  "
          f"{dt * 1e6 / b:6.1f} us/tile", flush=True)
    return dt * 1e6 / b


def main():
    rng = np.random.default_rng(0)
    opts = resolve_xla_options("auto")
    out = {"ps": PS, "n": N, "options": "auto",
           "device": str(jax.devices()[0])}

    orig_in = L.instance_norm
    orig_resolve = L.resolve_mxu_precision

    def in_no_cast(x, eps=1e-5):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps)

    def resolve_default_ok(conv_precision, dtype):
        if conv_precision == "default":
            return None
        return orig_resolve(conv_precision, dtype)

    arms = [
        ("bf16", jnp.bfloat16, None, {}),
        ("32_fast", None, "high", {}),
        ("32_convdefault", None, "default",
         {"resolve_mxu_precision": resolve_default_ok}),
        ("bf16_in_bf16", jnp.bfloat16, None, {"instance_norm": in_no_cast}),
        ("bf16_highconv", jnp.bfloat16, "high", {}),
    ]

    for b in (256, 512):
        for name, dtype, cp, patches in arms:
            for k, v in patches.items():
                setattr(L, k, v)
            try:
                gen = GeneratorJ(dtype=dtype, conv_precision=cp, **GEN_KW)
                g_vars = gen.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, PS, PS, C)))
                in_dt = dtype or jnp.float32
                sets = [jnp.asarray(
                    rng.random((b, PS, PS, C), np.float32) * 2 - 1, in_dt)
                    for _ in range(3)]
                fn = jax.jit(lambda t: gen.apply(g_vars, t, train=False),
                             compiler_options=opts)
                out[f"{name}_b{b}_us_per_tile"] = round(
                    measure(name, fn, sets, b), 1)
                del sets
            finally:
                L.instance_norm = orig_in
                L.resolve_mxu_precision = orig_resolve

    path = Path(__file__).resolve().parents[1] / \
        "docs/perf/bf16_inversion_r5.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
