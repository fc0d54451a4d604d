"""Pallas TPU kernel: fused InstanceNorm + activation.

The generator/discriminator interleave convs with InstanceNorm + LeakyReLU /
ReLU (reference src/models/generator.py:91-121, discriminator.py:42-79). XLA
compiles the norm as reduce + broadcast-normalize and fuses the activation,
but materializes an fp32 upcast of the activation tensor between passes under
a bf16 policy. This kernel keeps one (sample, channel-block) tile resident in
VMEM, computes the HxW statistics in fp32, and applies normalize+activation
in the same pass — one HBM read and one write per element, no fp32
round-trip.

Numerics identical to models.layers.instance_norm (biased variance, eps 1e-5,
fp32 statistics); property-tested against it in tests/test_pallas_ops.py and
usable on CPU via interpret mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, *, eps: float, act: Optional[str], slope: float):
    x = x_ref[...].astype(jnp.float32)          # (1, H, W, Cb)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if act == "leaky_relu":
        y = jnp.where(y >= 0, y, y * slope)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


def fits_vmem(h: int, w: int, c: int) -> bool:
    """One full (1, H, W, C) fp32 tile must fit the ~6 MB VMEM budget.

    Channels can't be sub-blocked (the last block dim must be 128-divisible
    or full, and IN statistics need the whole HxW extent per channel), so a
    sample that doesn't fit falls back to the plain XLA implementation.
    """
    return h * w * c * 4 <= 6 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("eps", "act", "slope", "interpret"))
def instance_norm_act(
    x: jax.Array,
    eps: float = 1e-5,
    act: Optional[str] = None,
    slope: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """Fused InstanceNorm(+activation) over NHWC via one Pallas pass."""
    n, h, w, c = x.shape
    if not fits_vmem(h, w, c):
        from patch_toon_tpu.models.layers import instance_norm, leaky_relu

        y = instance_norm(x, eps)
        if act == "leaky_relu":
            y = leaky_relu(y, slope)
        elif act == "relu":
            y = jnp.maximum(y, 0)
        return y
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, act=act, slope=slope),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,),
        in_specs=[pl.BlockSpec(
            (1, h, w, c),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM,
        )],
        out_specs=pl.BlockSpec(
            (1, h, w, c),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM,
        ),
        interpret=interpret,
    )(x)
