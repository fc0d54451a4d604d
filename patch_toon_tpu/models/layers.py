"""Shared NN building blocks, NHWC / TPU-first.

Numerics match the reference's torch layers exactly (so golden parity tests
against /root/reference/src/models pass):

- conv weight init N(0, 0.02), zero bias (reference src/models/generator.py:149-154)
- InstanceNorm: per-(N,C) over HxW, biased variance, eps 1e-5, NO affine
  (torch nn.InstanceNorm2d defaults), statistics always in fp32
- LeakyReLU slope 0.2
- bilinear 2x upsample with align_corners=True (reference
  src/models/generator.py:13), implemented as two small matmuls so it runs on
  the MXU instead of a gather
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torch-compatible conv initialisation: N(0, 0.02) weights, zero bias
conv_kernel_init = nn.initializers.normal(stddev=0.02)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d without affine params; stats in fp32 regardless of dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(orig_dtype)


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def fused_instance_norm_act(
    x: jax.Array, act: Optional[str], slope: float = 0.2
) -> jax.Array:
    """InstanceNorm + activation via the fused Pallas kernel on TPU.

    Inference-only fast path (pallas_call has no autodiff rule); falls back
    to the plain ops off-TPU. Numerics match instance_norm + activation to a
    bf16 ulp (reduction order differs inside the kernel).
    """
    if jax.default_backend() == "tpu" and x.ndim == 4:
        from patch_toon_tpu.ops.pallas_norm import instance_norm_act

        return instance_norm_act(x, act=act, slope=slope)
    y = instance_norm(x)
    if act == "leaky_relu":
        y = leaky_relu(y, slope)
    elif act == "relu":
        y = nn.relu(y)
    return y


@functools.lru_cache(maxsize=64)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Interpolation matrix A (out x in): y = A @ x, align_corners=True."""
    a = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        a[:, 0] = 1.0
        return a
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        lo = min(lo, in_size - 2)
        w = src - lo
        a[i, lo] = 1.0 - w
        a[i, lo + 1] = w
    return a


def upsample2x_bilinear_align_corners(x: jax.Array) -> jax.Array:
    """NHWC 2x bilinear upsample, align_corners=True, as two MXU matmuls.

    Matches torch nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True) — reference src/models/generator.py:13.
    """
    n, h, w, c = x.shape
    ah = jnp.asarray(_align_corners_matrix(h, 2 * h), dtype=x.dtype)
    aw = jnp.asarray(_align_corners_matrix(w, 2 * w), dtype=x.dtype)
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    # (2H,H) @ (N,H,W,C) over H, then (2W,W) over W
    y = jnp.einsum("oh,nhwc->nowc", ah, x, precision=precision)
    y = jnp.einsum("pw,nowc->nopc", aw, y, precision=precision)
    return y


def resolve_mxu_precision(conv_precision: Optional[str], dtype: Any):
    """Map the model-level ``conv_precision`` knob to a lax.Precision.

    ``None`` keeps the parity policy: fp32 runs the MXU at HIGHEST (6-pass
    bf16 emulation, matches torch to fp32 roundoff); bf16 uses the fast
    default. ``"high"`` selects the tf32-style 3-pass bf16 decomposition
    (~2x the fp32-parity conv throughput on TPU at ~1e-6 relative error) —
    exposed to users as precision ``"32_fast"``.
    """
    if conv_precision == "high":
        return jax.lax.Precision.HIGH
    if conv_precision == "highest":
        return jax.lax.Precision.HIGHEST
    if conv_precision is not None:
        raise ValueError(f"Unknown conv_precision: {conv_precision!r}")
    return (
        jax.lax.Precision.HIGHEST
        if dtype is None or dtype == jnp.float32
        else None
    )


def torch_conv(
    features: int,
    kernel_size: int,
    stride: int = 1,
    padding: int = 0,
    use_bias: bool = True,
    dtype: Any = None,
    name: Optional[str] = None,
    conv_precision: Optional[str] = None,
    quant_mode: Optional[str] = None,
) -> nn.Module:
    """Torch-compatible 2D conv (explicit zero padding, NHWC, N(0,0.02) init).

    Precision policy: when running in fp32 (dtype None/float32) the MXU is
    driven at HIGHEST precision so results match the torch reference to fp32
    roundoff; under a bf16 compute policy the fast default is used. See
    resolve_mxu_precision for the opt-in "32_fast" 3-pass mode.

    ``quant_mode`` ("calib"/"int8") swaps in QuantConv — identical params
    (same tree, so trained checkpoints load unchanged) with w8a8 inference
    on the int8 MXU path (see QuantConv for measured throughput).
    """
    if quant_mode is not None:
        return QuantConv(
            features=features, kernel_size=kernel_size, stride=stride,
            padding=padding, use_bias=use_bias, mode=quant_mode,
            dtype=dtype, conv_precision=conv_precision, name=name)
    precision = resolve_mxu_precision(conv_precision, dtype)
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        kernel_init=conv_kernel_init,
        bias_init=nn.initializers.zeros_init(),
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=precision,
        name=name,
    )


class QuantConv(nn.Module):
    """w8a8 quantized conv for the int8 MXU (inference-only, opt-in).

    Parameters are the SAME fp32 kernel/bias as nn.Conv (same names and
    shapes), so any trained checkpoint loads unchanged; quantization is a
    serving-time transform. Two static modes:

    - ``calib``: runs the normal fp conv (parity precision policy) and
      folds the input's absmax into the ``quant`` collection variable
      ``a_scale`` (apply with ``mutable=["quant"]``; repeated batches
      accumulate via max).
    - ``int8``: activations quantize per-tensor against the calibrated
      ``a_scale`` (symmetric, so torch-style zero padding stays exact),
      weights per-output-channel against their own absmax (recomputed from
      the fp params at trace time — negligible next to the conv), the conv
      accumulates int32 on the MXU, and the result dequantizes to the
      compute dtype before bias.

    No reference equivalent (the reference serves fp16 CUDA,
    /root/reference/generator.py:184-185). Measured end-to-end on the full
    generator (v5e, B=512 80x80 tiles, tools/profile_quant.py,
    docs/perf/quant_r3.json): 1.22x over bf16 under plain XLA options but
    a WASH (1.015x) under the tuned scoped-VMEM options the engine ships —
    the program is not MXU-bound at these shapes, so halving MXU time
    doesn't move the wall clock. Kept as an opt-in experiment; quality
    cost is small (max |int8-bf16| ~0.01 on the tanh output, ~56 dB masked
    PSNR vs fp on a trained checkpoint).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    mode: str = "int8"  # "calib" | "int8"
    dtype: Any = None
    conv_precision: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel", conv_kernel_init,
            (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros_init(),
            (self.features,), jnp.float32) if self.use_bias else None
        a_scale = self.variable(
            "quant", "a_scale", lambda: jnp.zeros((), jnp.float32))
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        dn = ("NHWC", "HWIO", "NHWC")
        cdt = self.dtype or jnp.float32

        if self.mode == "calib":
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
            if not self.is_initializing():
                a_scale.value = jnp.maximum(a_scale.value, amax)
            y = jax.lax.conv_general_dilated(
                x.astype(cdt), kernel.astype(cdt),
                (self.stride, self.stride), pad, dimension_numbers=dn,
                precision=resolve_mxu_precision(self.conv_precision,
                                                self.dtype))
        elif self.mode == "int8":
            # Never-calibrated guard: a_scale's zeros init would clamp to
            # 1e-12 and quantize every activation to +/-127 (garbage, and
            # silent — this runs under jit, so raising isn't possible).
            # Fall back to a per-batch dynamic scale instead: numerically
            # sane for callers that skip the engine's calib pass.
            dyn = jnp.max(jnp.abs(x.astype(jnp.float32)))
            eff = jnp.where(a_scale.value > 0, a_scale.value, dyn)
            s = jnp.maximum(eff, 1e-12) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            w_amax = jnp.maximum(
                jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12)
            w_s = w_amax / 127.0
            wq = jnp.round(kernel / w_s).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, wq, (self.stride, self.stride), pad,
                dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * (s * w_s)).astype(cdt)
        else:
            raise ValueError(f"Unknown quant mode: {self.mode!r}")
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ConvBlock(nn.Module):
    """Conv -> (InstanceNorm) -> (activation).

    Mirrors reference _make_conv_block (src/models/generator.py:156-182).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    norm: Optional[str] = "instance_norm"
    act: Optional[str] = None  # "leaky_relu" | "relu" | None
    dtype: Any = None
    fused_norm: bool = False  # inference-only Pallas IN+act kernel
    conv_precision: Optional[str] = None  # None (parity) | "high" (32_fast)
    quant_mode: Optional[str] = None  # None | "calib" | "int8" (QuantConv)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = torch_conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.use_bias,
            dtype=self.dtype,
            name="conv",
            conv_precision=self.conv_precision,
            quant_mode=self.quant_mode,
        )(x)
        if self.norm == "instance_norm":
            if self.fused_norm:
                return fused_instance_norm_act(y, self.act)
            y = instance_norm(y)
        elif self.norm == "batch_norm":
            raise NotImplementedError(
                "batch_norm inside ConvBlock is not used by any shipped config"
            )
        if self.act == "leaky_relu":
            y = leaky_relu(y, 0.2)
        elif self.act == "relu":
            y = nn.relu(y)
        return y


class UpConvBlock(nn.Module):
    """2x bilinear upsample (align_corners) -> Conv3x3 -> (norm) -> (act).

    Mirrors reference _make_upconv_block (src/models/generator.py:184-208).
    """

    features: int
    use_bias: bool = True
    norm: Optional[str] = "instance_norm"
    act: Optional[str] = "relu"
    dtype: Any = None
    fused_norm: bool = False
    conv_precision: Optional[str] = None
    quant_mode: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = upsample2x_bilinear_align_corners(x)
        y = torch_conv(self.features, 3, 1, 1, self.use_bias, dtype=self.dtype,
                       name="conv", conv_precision=self.conv_precision,
                       quant_mode=self.quant_mode)(y)
        if self.norm == "instance_norm":
            if self.fused_norm:
                return fused_instance_norm_act(y, self.act)
            y = instance_norm(y)
        if self.act == "relu":
            y = nn.relu(y)
        elif self.act == "leaky_relu":
            y = leaky_relu(y, 0.2)
        return y
