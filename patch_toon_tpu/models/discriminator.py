"""DiscriminatorN_IN: PatchGAN discriminator with InstanceNorm.

TPU-native re-implementation of the reference discriminator
(/root/reference/src/models/discriminator.py:8-150): 4x4 stride-2 conv stack
doubling filters per layer (capped at 8x), a stride-1 pre-output block, and a
1-channel output map. Optional gaussian input noise during training.

Returns the raw logit map (the reference returns ``(map, None)`` where the
second element exists only for API compatibility; here callers get the map).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from flax import linen as nn

from patch_toon_tpu.models.layers import torch_conv, ConvBlock


class DiscriminatorN_IN(nn.Module):
    """PatchGAN discriminator (NHWC).

    Args mirror the reference constructor (discriminator.py:14-24);
    ``additional_channels`` is accepted for config compatibility and unused.
    """

    input_channels: int = 3
    additional_channels: Optional[Dict[str, Any]] = None
    num_filters: int = 64
    n_layers: int = 3
    use_noise: bool = False
    noise_sigma: float = 0.2
    norm_layer: str = "instance_norm"
    use_bias: bool = True
    dtype: Any = None
    fused_norm: bool = False
    conv_precision: Optional[str] = None  # None (parity) | "high" (32_fast)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        noise_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """x: (N, H, W, C) in [-1, 1]. Returns logit map (N, H', W', 1)."""
        if self.use_noise and train:
            if noise_rng is None:
                raise ValueError("use_noise=True requires noise_rng during training")
            x = x + jax.random.normal(noise_rng, x.shape, x.dtype) * self.noise_sigma

        norm = self.norm_layer if self.norm_layer in ("instance_norm",) else None
        dt = self.dtype
        cp = self.conv_precision

        # initial: Conv4x4 s2 p1 -> LReLU (no norm)       [discriminator.py:42-49]
        out = ConvBlock(self.num_filters, 4, 2, 1, self.use_bias, None,
                        "leaky_relu", dtype=dt, conv_precision=cp,
                        name="initial")(x)

        # intermediate: filters double per layer, cap 8x  [discriminator.py:53-67]
        curr = self.num_filters
        for i in range(1, self.n_layers):
            nxt = min(curr * 2, self.num_filters * 8)
            out = ConvBlock(nxt, 4, 2, 1, self.use_bias, norm, "leaky_relu",
                            dtype=dt, fused_norm=self.fused_norm,
                            conv_precision=cp,
                            name=f"intermediate_{i - 1}")(out)
            curr = nxt

        # pre-output: Conv4x4 s1 p1 -> IN -> LReLU        [discriminator.py:71-79]
        nxt = min(curr * 2, self.num_filters * 8)
        out = ConvBlock(nxt, 4, 1, 1, self.use_bias, norm, "leaky_relu",
                        dtype=dt, fused_norm=self.fused_norm,
                        conv_precision=cp, name="pre_output")(out)

        # output: Conv4x4 s1 p1 -> 1 channel, no norm/act [discriminator.py:83-90]
        out = torch_conv(1, 4, 1, 1, self.use_bias, dtype=dt, name="output",
                         conv_precision=cp)(out)
        return out
