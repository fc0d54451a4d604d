"""patch-toon-tpu: TPU-native few-shot patch-based video stylization framework.

A brand-new JAX/XLA/Pallas/pjit implementation with the full capabilities of
Mega-Gorilla/Video-to-Video_Few-Shot-Patch-Based-Training (Texler et al.,
"Interactive Video Stylization Using Few-Shot Patch-Based Training",
arXiv:2004.14489): train a small U-Net-style generator against a PatchGAN
discriminator with a VGG perceptual loss on random masked patches cut from a
handful of hand-stylized keyframes, then stylize whole videos through tiled,
Gaussian-blended inference with optional guide channels.

Everything inside is TPU-first: device-resident keyframes with a batched
patch-gather sampler, a single jitted GAN train step, NHWC convolutions on the
MXU, instance-norm statistics in fp32, batched tile inference, and
`jax.sharding.Mesh`-based scale-out.
"""

from patch_toon_tpu.version import __version__

__all__ = ["__version__"]
