#!/usr/bin/env python
"""Small-tile-batch generator pathology hunt (round-5 inversion closure).

docs/perf/chain_parts_r5.json measured a FULL B=64 generator batch at
29.8 ms — ABSOLUTELY slower than a full B=128 batch (18.8 ms). The real
quality scene's mask covers ~15.8% of the frame, so masked serving lands
on the 64 bucket, and that pathology is the prime suspect for the
engine-level "bf16 slower than 32_fast" inversion
(docs/perf/fp32_modes_r5.json: 65.6 vs 40.6 ms/frame).

This sweeps the BARE generator (anti-CSE: 3 distinct input sets
round-robin, device-side slice sync, median of dispatch differences) at
small batches under the shipped tuned scoped-VMEM options AND stock XLA
options, and adds the fp32 arms at the suspect bucket:

  bf16   x B in {16, 32, 64, 96, 128, 256} x options {auto, default}
  32_fast, 32_convdefault x B in {64, 128}  (options auto)

Decision rule: if bf16 B=64 is absolutely slower than B=128 under both
option sets, the fix is a bucket floor (pad small batches up to the first
monotone bucket) — pure padding, bit-identical outputs. If only under
"auto", gate the scoped-VMEM option on batch size instead.

Writes docs/perf/small_batch_r5.json.
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

_orig_resolve = L.resolve_mxu_precision


def _resolve_default_ok(conv_precision, dtype):
    """Accept 'default' = 1-pass bf16 convs on fp32 tensors (measure-only)."""
    if conv_precision == "default":
        return None
    return _orig_resolve(conv_precision, dtype)

N = 12
PS, C = 80, 6
GEN_KW = dict(input_channels=C, use_bias=True, tanh=True,
              append_smoothers=True, resnet_blocks=7,
              filters=(32, 64, 128, 128, 128, 64),
              norm_layer="instance_norm")


def measure(label, fn, sets, b):
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
    print(f"{label:28s} B={b:4d} {dt * 1e3:8.2f} ms  "
          f"{dt * 1e6 / b:6.1f} us/tile", flush=True)
    return dt * 1e3


def main():
    rng = np.random.default_rng(0)
    out = {"ps": PS, "n": N, "device": str(jax.devices()[0])}

    def arm(name, dtype, cp, b, opts_name):
        opts = resolve_xla_options("auto") if opts_name == "auto" else None
        L.resolve_mxu_precision = (
            _resolve_default_ok if cp == "default" else _orig_resolve)
        gen = GeneratorJ(dtype=dtype, conv_precision=cp, **GEN_KW)
        g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))
        in_dt = dtype or jnp.float32
        sets = [jnp.asarray(rng.random((b, PS, PS, C), np.float32) * 2 - 1,
                            in_dt) for _ in range(3)]
        fn = jax.jit(lambda t: gen.apply(g_vars, t, train=False),
                     compiler_options=opts)
        key = f"{name}_{opts_name}_b{b}_ms"
        out[key] = round(measure(f"{name}/{opts_name}", fn, sets, b), 2)

    for b in (16, 32, 64, 96, 128, 256):
        for opts_name in ("auto", "default"):
            arm("bf16", jnp.bfloat16, None, b, opts_name)
    for b in (64, 128):
        arm("32_fast", None, "high", b, "auto")
        arm("32_convdefault", None, "default", b, "auto")

    path = Path(__file__).resolve().parents[1] / \
        "docs/perf/small_batch_r5.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
