"""Model zoo (re-exports mirror reference src/models/__init__.py:1-5)."""

from patch_toon_tpu.models.discriminator import DiscriminatorN_IN
from patch_toon_tpu.models.generator import GeneratorJ, ResNetBlock
from patch_toon_tpu.models.perception import (
    PerceptualVGG19,
    init_vgg_params,
    perceptual_mse,
)

__all__ = [
    "GeneratorJ",
    "ResNetBlock",
    "DiscriminatorN_IN",
    "PerceptualVGG19",
    "init_vgg_params",
    "perceptual_mse",
]
