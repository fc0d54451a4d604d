"""GeneratorJ: the U-Net-style image-to-image stylization generator.

TPU-native re-implementation of the reference generator
(/root/reference/src/models/generator.py:60-238): 7x7 conv stem, two stride-2
downsamples, N residual blocks, two bilinear-upsample+conv blocks with skip
concats, a 7x7 conv over (features, stem, raw input), optional 2-conv
"smoothers" with BatchNorm, and a 1x1 conv head with optional tanh.

Layout is NHWC (TPU-friendly); all convs hit the MXU via XLA. Instance-norm
statistics stay in fp32 even under a bf16 compute policy.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from patch_toon_tpu.models.layers import (
    ConvBlock,
    UpConvBlock,
    fused_instance_norm_act,
    instance_norm,
    torch_conv,
)


class ResNetBlock(nn.Module):
    """Residual block: x + (ReLU -> Conv3x3 -> IN -> ReLU -> Conv3x3 -> IN)(x).

    Mirrors reference src/models/generator.py:18-58 (pre-activation ordering).
    """

    channels: int
    norm_layer: Optional[str] = "instance_norm"
    use_bias: bool = False
    dtype: Any = None
    fused_norm: bool = False
    conv_precision: Optional[str] = None  # None (parity) | "high" (32_fast)
    quant_mode: Optional[str] = None  # None | "calib" | "int8"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def norm(z):
            if self.norm_layer != "instance_norm":
                return z
            if self.fused_norm:
                return fused_instance_norm_act(z, None)
            return instance_norm(z)

        y = nn.relu(x)
        y = torch_conv(self.channels, 3, 1, 1, self.use_bias, dtype=self.dtype,
                       name="conv1", conv_precision=self.conv_precision,
                       quant_mode=self.quant_mode)(y)
        y = norm(y)
        y = nn.relu(y)
        y = torch_conv(self.channels, 3, 1, 1, self.use_bias, dtype=self.dtype,
                       name="conv2", conv_precision=self.conv_precision,
                       quant_mode=self.quant_mode)(y)
        y = norm(y)
        return x + y


class GeneratorJ(nn.Module):
    """Few-shot patch stylization generator (NHWC).

    Args mirror the reference constructor (src/models/generator.py:65-76);
    ``additional_channels`` and ``input_size`` are accepted for config
    compatibility and unused, exactly like the reference (generator.py:75-79).
    """

    input_channels: int = 3
    additional_channels: Optional[Dict[str, Any]] = None
    filters: Sequence[int] = (32, 64, 128, 128, 128, 64)
    norm_layer: str = "instance_norm"
    use_bias: bool = False
    resnet_blocks: int = 7
    tanh: bool = True
    append_smoothers: bool = True
    input_size: int = 256
    dtype: Any = None
    fused_norm: bool = False  # inference-only Pallas IN+act fast path
    conv_precision: Optional[str] = None  # None (parity) | "high" (32_fast)
    # w8a8 serving on the int8 MXU (QuantConv; every conv except the 1x1
    # output head, which stays fp for output fidelity). None | calib | int8.
    quant_mode: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (N, H, W, input_channels) in [-1, 1]. Returns (N, H, W, 3)."""
        f = list(self.filters)
        norm = self.norm_layer
        dt = self.dtype
        cp = self.conv_precision
        qm = self.quant_mode

        # stem: Conv7x7 s1 p3 -> IN -> LeakyReLU(0.2)    [generator.py:91-94]
        conv0 = ConvBlock(f[0], 7, 1, 3, self.use_bias, norm, "leaky_relu",
                          dtype=dt, fused_norm=self.fused_norm,
                          conv_precision=cp, quant_mode=qm,
                          name="initial_conv")(x)
        # downsamples: Conv3x3 s2 p1 -> IN -> LReLU      [generator.py:97-104]
        conv1 = ConvBlock(f[1], 3, 2, 1, self.use_bias, norm, "leaky_relu",
                          dtype=dt, fused_norm=self.fused_norm,
                          conv_precision=cp, quant_mode=qm,
                          name="downsample1")(conv0)
        conv2 = ConvBlock(f[2], 3, 2, 1, self.use_bias, norm, "leaky_relu",
                          dtype=dt, fused_norm=self.fused_norm,
                          conv_precision=cp, quant_mode=qm,
                          name="downsample2")(conv1)

        # residual trunk                                  [generator.py:107-110]
        out = conv2
        for i in range(self.resnet_blocks):
            out = ResNetBlock(f[2], norm, self.use_bias, dtype=dt,
                              fused_norm=self.fused_norm, conv_precision=cp,
                              quant_mode=qm, name=f"resnet_{i}")(out)

        # decoder with skip concats                       [generator.py:114-121]
        out = UpConvBlock(f[4], self.use_bias, norm, "relu", dtype=dt,
                          fused_norm=self.fused_norm, conv_precision=cp,
                          quant_mode=qm,
                          name="upsample2")(jnp.concatenate([out, conv2], axis=-1))
        out = UpConvBlock(f[4], self.use_bias, norm, "relu", dtype=dt,
                          fused_norm=self.fused_norm, conv_precision=cp,
                          quant_mode=qm,
                          name="upsample1")(jnp.concatenate([out, conv1], axis=-1))

        # 7x7 conv over (decoded, stem, raw input)        [generator.py:124-128]
        out = torch_conv(f[5], 7, 1, 3, self.use_bias, dtype=dt,
                         name="conv11", conv_precision=cp, quant_mode=qm)(
            jnp.concatenate([out, conv0, x], axis=-1)
        )
        out = nn.relu(out)

        # optional smoothers: Conv -> ReLU -> BN -> Conv -> ReLU
        #                                                  [generator.py:131-138]
        if self.append_smoothers:
            out = torch_conv(f[5], 3, 1, 1, self.use_bias, dtype=dt,
                       name="smoother_conv1", conv_precision=cp,
                       quant_mode=qm)(out)
            out = nn.relu(out)
            out = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch momentum 0.1 == flax momentum 0.9
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name="smoother_bn",
            )(out.astype(jnp.float32)).astype(out.dtype)
            out = torch_conv(f[5], 3, 1, 1, self.use_bias, dtype=dt,
                       name="smoother_conv2", conv_precision=cp,
                       quant_mode=qm)(out)
            out = nn.relu(out)

        # head: Conv1x1 (bias always on, as in reference generator.py:141) + tanh
        out = torch_conv(3, 1, 1, 0, True, dtype=dt, name="output",
                         conv_precision=cp)(out)
        if self.tanh:
            out = jnp.tanh(out)
        return out
