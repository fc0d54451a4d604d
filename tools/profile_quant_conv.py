#!/usr/bin/env python
"""Bare-conv int8 vs bf16 on the generator's hot shapes, + an XLA-option
sweep for the int8 full generator (profile_quant.py showed int8 LOSES to
bf16 under the shipped vmem_28m options: 113.0 vs 88.8 us/tile at B=512).

Anti-CSE methodology from tools/profile_convs.py: inputs rotate over 3
buffers, output fetched per window, dispatch-difference timing.

Usage: python tools/profile_quant_conv.py
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
from patch_toon_tpu.utils.xla_options import resolve_xla_options

B, N = 512, 12


def measure(name, fn, sets, scale=1.0):
    """Median-of-differences, tiny device-side-slice sync fetch (a whole-
    output fetch rides the tunnel and swamps the difference — see
    tools/profile_quant.py measure)."""
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
    print(f"{name:34s} {dt * 1e3:8.2f} ms  {dt * 1e6 / B:6.1f} us/tile",
          flush=True)
    return dt


def conv_pair(tag, hw, cin, cout, k, opts):
    rng = np.random.default_rng(0)
    pad = [(k // 2, k // 2)] * 2
    dn = ("NHWC", "HWIO", "NHWC")
    xb = [jnp.asarray(rng.random((B, hw, hw, cin), np.float32) * 2 - 1,
                      jnp.bfloat16) for _ in range(3)]
    x8 = [jnp.asarray(rng.integers(-127, 128, (B, hw, hw, cin),
                                   dtype=np.int8)) for _ in range(3)]
    wb = jnp.asarray(rng.random((k, k, cin, cout), np.float32) * 0.1,
                     jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout),
                                  dtype=np.int8))
    fb = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, wb, (1, 1), pad, dimension_numbers=dn), compiler_options=opts)
    f8 = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, w8, (1, 1), pad, dimension_numbers=dn,
        preferred_element_type=jnp.int32), compiler_options=opts)
    tb = measure(f"{tag} bf16", fb, xb)
    t8 = measure(f"{tag} int8(bare)", f8, x8)
    print(f"  -> int8/bf16 speedup {tb / t8:.2f}x", flush=True)


def main():
    opts = resolve_xla_options("auto")
    # conv11: 7x7 over 102ch at 80x80 — 45% of generator FLOPs
    conv_pair("conv11 80x80 102->64 k7", 80, 102, 64, 7, opts)
    # resnet conv: 3x3 128->128 at 20x20
    conv_pair("res 20x20 128->128 k3", 20, 128, 128, 3, opts)
    # int8 full generator under an XLA vmem sweep
    print("-- int8 generator option sweep --")
    rng = np.random.default_rng(0)
    sets = [jnp.asarray(rng.random((B, 80, 80, 6), np.float32) * 2 - 1,
                        jnp.bfloat16) for _ in range(3)]
    gen = GeneratorJ(input_channels=6, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64),
                     norm_layer="instance_norm", dtype=jnp.bfloat16)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 80, 6)))
    calib = gen.clone(quant_mode="calib")
    _, mut = jax.jit(lambda v, x: calib.apply(
        v, x, train=False, mutable=["quant"]))(g_vars, sets[0])
    q_vars = dict(g_vars, quant=mut["quant"])
    qgen = gen.clone(quant_mode="int8")
    for name, o in [
        ("vmem_16m", {"xla_tpu_scoped_vmem_limit_kib": 16384}),
        ("vmem_40m", {"xla_tpu_scoped_vmem_limit_kib": 40960}),
    ]:
        fn = jax.jit(lambda t: qgen.apply(q_vars, t, train=False),
                     compiler_options=o)
        measure(f"int8 gen {name}", fn, sets)


if __name__ == "__main__":
    main()
