#!/usr/bin/env python
"""Measure the w8a8 int8-MXU generator (inference.quantize=int8) vs bf16.

Times the FULL reference-config generator at the serving tile shape with
dispatch-difference timing (same methodology as profile_gen_parts.py:
np.asarray fetch, T(2N)-T(N) to cancel dispatch+transport), three variants:

- bf16       : the serving default (models/layers.py nn.Conv path)
- int8       : QuantConv w8a8 — int8 x int8 -> int32 on the MXU
- int8_tuned : int8 under the tuned XLA options (resolve_xla_options
               "auto", the engine's actual compile environment)

Also prints a quality proxy: max|int8 - bf16| on the tanh output for the
same random weights/inputs. Writes docs/perf/quant_r3.json.

No reference equivalent (the reference serves fp16 CUDA,
/root/reference/generator.py:184-185).

Usage: python tools/profile_quant.py [bucket] [N]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N = int(sys.argv[2]) if len(sys.argv) > 2 else 12
PS, C = 80, 6
DT = jnp.bfloat16


def measure(name, fn, sets):
    """Median-of-differences with a TINY sync fetch (a device-side slice):
    fetching the whole output rides the tunnel (hundreds of MB/s of noise)
    and swamps the differenced window — the first version of this tool did
    that and produced garbage (13.4 s for a 21 ms conv)."""
    def timed(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(sets[i % 3])
        np.asarray(out[0, 0, 0])  # device-side slice -> bytes, not MBs
        return time.perf_counter() - t0

    np.asarray(fn(sets[0])[0, 0, 0])  # compile+warm
    timed(2)
    dt = float(np.median([(timed(2 * N) - timed(N)) / N for _ in range(3)]))
    print(f"{name:24s} {dt * 1e3:8.2f} ms  {dt * 1e6 / B:6.1f} us/tile",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    sets = [jnp.asarray(rng.random((B, PS, PS, C), np.float32) * 2 - 1, DT)
            for _ in range(3)]
    base = dict(input_channels=C, use_bias=True, tanh=True,
                append_smoothers=True, resnet_blocks=7,
                filters=(32, 64, 128, 128, 128, 64),
                norm_layer="instance_norm", dtype=DT)
    gen = GeneratorJ(**base)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))
    opts = resolve_xla_options("auto")

    # calibrate once on the first tile batch (engine._ensure_quant shape)
    calib = gen.clone(quant_mode="calib")
    _, mut = jax.jit(
        lambda v, x: calib.apply(v, x, train=False, mutable=["quant"])
    )(g_vars, sets[0])
    q_vars = dict(g_vars, quant=jax.tree_util.tree_map(jnp.asarray,
                                                       mut["quant"]))
    qgen = gen.clone(quant_mode="int8")

    fns = {
        "bf16": jax.jit(lambda t: gen.apply(g_vars, t, train=False)),
        "int8": jax.jit(lambda t: qgen.apply(q_vars, t, train=False)),
        "bf16_tuned": jax.jit(
            lambda t: gen.apply(g_vars, t, train=False),
            compiler_options=opts),
        "int8_tuned": jax.jit(
            lambda t: qgen.apply(q_vars, t, train=False),
            compiler_options=opts),
    }
    res = {name: measure(name, fn, sets) for name, fn in fns.items()}

    err = np.abs(
        np.asarray(fns["int8"](sets[0]), np.float32)
        - np.asarray(fns["bf16"](sets[0]), np.float32))
    print(f"max|int8-bf16| on tanh output: {err.max():.4f} "
          f"(mean {err.mean():.5f})")

    out = {
        "bucket": B, "ps": PS, "n": N,
        "us_per_tile": {k: v * 1e6 / B for k, v in res.items()},
        "speedup_plain": res["bf16"] / res["int8"],
        "speedup_tuned": res["bf16_tuned"] / res["int8_tuned"],
        "max_abs_err": float(err.max()), "mean_abs_err": float(err.mean()),
    }
    path = Path(__file__).resolve().parents[1] / "docs/perf/quant_r3.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
