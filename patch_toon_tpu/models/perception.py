"""PerceptualVGG19: VGG19 feature extractor for the perceptual loss.

TPU-native re-implementation of the reference perceptual network
(/root/reference/src/models/perception.py:9-149). The network walks the
torchvision ``vgg19.features`` layer sequence and collects outputs at the
configured indices (index 0 = conv1_1 pre-ReLU, 3 = relu1_2, 5 = conv2_1
pre-ReLU for the default ``[0, 3, 5]``), flattens and concatenates them, and
the loss is the MSE between feature vectors (reference lightning_model.py:271-275).

Only the prefix of the network up to ``max(feature_layers)`` is built — for
the default config that is 3 convs + 1 maxpool, which compiles to a handful of
MXU convs. Weights come from a converted torchvision ``.npz``
(tools/convert_vgg.py); with no weights file available (this build has zero
egress), a documented deterministic random initialization (seed 42) is used —
random convolutional features still act as a structured perceptual metric.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from patch_toon_tpu.models.layers import torch_conv

# torchvision VGG19 'E' configuration: conv widths with 'M' maxpools
VGG19_CFG: Tuple[Any, ...] = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
    512, 512, 512, 512, "M", 512, 512, 512, 512, "M",
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def vgg19_layer_plan(max_index: int) -> List[Tuple[str, int]]:
    """Expand VGG19_CFG into the torchvision features index sequence.

    Returns [(op, features_index_or_width), ...] where op is
    'conv:<width>', 'relu', or 'pool', one entry per features index
    0..max_index inclusive.
    """
    plan: List[Tuple[str, int]] = []
    for width in VGG19_CFG:
        if width == "M":
            plan.append(("pool", 0))
        else:
            plan.append(("conv", int(width)))
            plan.append(("relu", 0))
        if len(plan) > max_index:
            break
    return plan[: max_index + 1]


class PerceptualVGG19(nn.Module):
    """VGG19 prefix feature extractor (NHWC input in [-1, 1])."""

    feature_layers: Sequence[int]
    use_normalization: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        """Returns the raw NHWC feature maps at the configured indices.

        The reference flattens each map NCHW and concatenates
        (perception.py:94-114); the loss downstream is a plain MSE over the
        concatenation (lightning_model.py:271-275), which is permutation-
        invariant — so the maps are returned unflattened (no transpose, no
        concat materialization; ~20% of the train step on v5e) and
        perceptual_mse reduces them directly. flatten_features() provides
        the reference's exact concat layout for parity tests / users.
        """
        feature_layers = sorted(self.feature_layers)
        if self.use_normalization:
            # [-1,1] -> [0,1] -> ImageNet stats (reference perception.py:75-92)
            x = (x + 1.0) / 2.0
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            x = (x - mean) / std

        feats: List[jax.Array] = []
        current = x
        for idx, (op, width) in enumerate(vgg19_layer_plan(max(feature_layers))):
            if op == "conv":
                current = torch_conv(width, 3, 1, 1, True, dtype=self.dtype,
                               name=f"features_{idx}")(current)
            elif op == "relu":
                current = nn.relu(current)
            elif op == "pool":
                current = nn.max_pool(current, (2, 2), strides=(2, 2))
            if idx in feature_layers:
                feats.append(current)
        return tuple(feats)


def flatten_features(feats: Sequence[jax.Array]) -> jax.Array:
    """Reference concat layout: each map flattened NCHW, concatenated
    (perception.py:94-114). Used by parity tests and external consumers."""
    n = feats[0].shape[0]
    return jnp.concatenate(
        [jnp.transpose(f, (0, 3, 1, 2)).reshape(n, -1) for f in feats],
        axis=1)


def perceptual_mse(feats_a: Sequence[jax.Array],
                   feats_b: Sequence[jax.Array]) -> jax.Array:
    """Mean squared error over all feature elements, in fp32.

    Value-matches reference lightning_model.py:271-275
    (``((fake - target) ** 2).mean()`` over the concatenation): an MSE over
    a concatenation equals sum-of-SSE / total count, independent of layout.
    """
    sse = jnp.float32(0)
    count = 0
    for a, b in zip(feats_a, feats_b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        sse = sse + jnp.sum(jnp.square(d))
        count += int(np.prod(a.shape))
    return sse / jnp.float32(count)


def init_vgg_params(
    feature_layers: Sequence[int],
    input_channels: int = 3,
    weights_path: Optional[str] = None,
    seed: int = 42,
) -> Any:
    """Build PerceptualVGG19 params.

    weights_path: ``.npz`` produced by tools/convert_vgg.py with arrays
    ``features.<i>.weight`` (OIHW) / ``features.<i>.bias``; otherwise a
    deterministic He-normal init (documented fallback for zero-egress builds).
    """
    module = PerceptualVGG19(feature_layers=tuple(feature_layers))
    dummy = jnp.zeros((1, 32, 32, input_channels), jnp.float32)
    params = module.init(jax.random.PRNGKey(seed), dummy)["params"]

    if weights_path:
        loaded = np.load(weights_path)
        new = {}
        for layer_name, layer_params in params.items():
            idx = int(layer_name.split("_")[-1])
            w = loaded[f"features.{idx}.weight"]  # OIHW
            b = loaded[f"features.{idx}.bias"]
            new[layer_name] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
                "bias": jnp.asarray(b),
            }
        params = new
    return {"params": params}
