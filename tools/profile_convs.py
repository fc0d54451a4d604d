#!/usr/bin/env python
"""Per-conv microbenchmark of the GeneratorJ inference hot path on TPU.

Times each conv shape of the default generator (80x80 tiles, bf16) as a
standalone jitted loop and reports achieved TFLOP/s vs the v5e bf16 peak
(~197 TF/s), to decide where a Pallas implicit-GEMM kernel pays.

Usage: python tools/profile_convs.py [batch] [iters]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
DTYPE = jnp.bfloat16

# (name, H, W, Cin, Cout, k, stride)  — the default GeneratorJ at tile 80
SHAPES = [
    ("initial_conv 7x7", 80, 80, 6, 32, 7, 1),
    ("downsample1 3x3s2", 80, 80, 32, 64, 3, 2),
    ("downsample2 3x3s2", 40, 40, 64, 128, 3, 2),
    ("resblock 3x3 (x14)", 20, 20, 128, 128, 3, 1),
    ("upsample2 3x3", 40, 40, 256, 128, 3, 1),
    ("upsample1 3x3", 80, 80, 192, 128, 3, 1),
    ("conv11 7x7", 80, 80, 166, 64, 7, 1),
    ("smoother 3x3 (x2)", 80, 80, 64, 64, 3, 1),
    ("output 1x1", 80, 80, 64, 3, 1, 1),
]


def time_conv(h, w, cin, cout, k, stride, iters=ITERS):
    pad = k // 2
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, h, w, cin), DTYPE)
    wgt = jax.random.normal(key, (k, k, cin, cout), DTYPE) * 0.05

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, wgt, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DTYPE,
        )

    from functools import partial

    # NONLINEAR feedback (max) so XLA can neither hoist the conv (its input
    # genuinely changes) nor move scalars across it (conv linearity rewrite).
    @partial(jax.jit, static_argnums=(1, 2))
    def loop(x, n, with_conv):
        def body(i, x):
            # full-tensor mean: the whole conv output is consumed (no
            # slice-of-conv rewrite); max keeps the input change nonlinear
            if with_conv:
                s = jnp.mean(conv(x).astype(jnp.float32)) * 1e-3 - 10.0
            else:
                s = jnp.mean(x.astype(jnp.float32)) * 1e-3 - 10.0
            return jnp.maximum(x, s.astype(DTYPE))
        x = jax.lax.fori_loop(0, n, body, x)
        return conv(x)

    def timed(n, with_conv):
        np.asarray(loop(x, n, with_conv)[0, 0, 0, :1])  # compile + warm
        t0 = time.perf_counter()
        np.asarray(loop(x, n, with_conv)[0, 0, 0, :1])  # full tunnel sync
        return time.perf_counter() - t0

    # two-point measurement cancels fixed dispatch/transport cost; the
    # conv-free baseline loop cancels the feedback's elementwise cost
    dt_conv = (timed(3 * iters, True) - timed(iters, True)) / (2 * iters)
    dt_base = (timed(3 * iters, False) - timed(iters, False)) / (2 * iters)
    dt = max(dt_conv - dt_base, 1e-9)

    ho, wo = h // stride, w // stride
    flops = 2 * B * ho * wo * k * k * cin * cout
    return dt, flops


def main():
    print(f"devices: {jax.devices()}  batch={B} dtype=bf16")
    total_t, total_f = 0.0, 0
    rows = []
    for name, h, w, cin, cout, k, s in SHAPES:
        dt, flops = time_conv(h, w, cin, cout, k, s)
        mult = 14 if "x14" in name else (2 if "x2" in name else 1)
        tf = flops / dt / 1e12
        rows.append((name, dt * 1e6 / B, tf, tf / 197 * 100, mult))
        total_t += dt * mult
        total_f += flops * mult
    print(f"{'layer':24s} {'us/tile':>8s} {'TF/s':>7s} {'%peak':>6s}")
    for name, us, tf, pct, mult in rows:
        print(f"{name:24s} {us:8.2f} {tf:7.1f} {pct:5.1f}%")
    print(f"\nsum (weighted): {total_t * 1e6 / B:.1f} us/tile, "
          f"{total_f / total_t / 1e12:.1f} TF/s "
          f"({total_f / total_t / 1e12 / 197 * 100:.1f}% peak)")


if __name__ == "__main__":
    main()
