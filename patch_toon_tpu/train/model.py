"""StyleTransferModel: config-driven GAN assembly (the L3 training module).

TPU-native equivalent of the reference's ``StyleTransferModel``
LightningModule glue (lightning_model.py:11-199): resolves
``input_channels: "auto"`` to 3 + Σ additional-channel depths
(lightning_model.py:71-88,128-157), validates the additional-channel schema
(lightning_model.py:90-115), builds the generator / discriminator /
perceptual networks from the same config dicts, and owns parameter/optimizer
initialization. Training itself is a pure jitted function — see
patch_toon_tpu.train.step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from patch_toon_tpu.config import to_container
from patch_toon_tpu.models import (
    DiscriminatorN_IN,
    GeneratorJ,
    PerceptualVGG19,
    init_vgg_params,
)
from patch_toon_tpu.train import optim
from patch_toon_tpu.train.state import GANTrainState


def calculate_total_channels(additional_channels: Optional[Dict[str, Any]]) -> int:
    """3 (RGB) + Σ channel depths (reference lightning_model.py:71-88)."""
    total = 3
    for name, cfg in (additional_channels or {}).items():
        depth = int(cfg.get("depth", 1)) if isinstance(cfg, dict) else 1
        total += depth
    return total


def validate_additional_channels(additional_channels: Optional[Dict[str, Any]]) -> None:
    """Schema validation (reference lightning_model.py:90-115)."""
    for name, cfg in (additional_channels or {}).items():
        if isinstance(cfg, dict):
            if not cfg.get("path"):
                raise ValueError(f"Channel {name}: 'path' is required")
            depth = cfg.get("depth", 1)
            if not isinstance(depth, int) or depth < 1:
                raise ValueError(f"Channel {name}: 'depth' must be a positive integer")


def _resolve_dtype(precision: Any) -> Any:
    if precision in ("bf16", "bfloat16", 16, "16"):
        return jnp.bfloat16
    return None  # fp32


def _resolve_conv_precision(precision: Any) -> Any:
    """"32_fast" = fp32 tensors with tf32-style 3-pass bf16 convs
    (lax.Precision.HIGH): ~2x the fp32-parity conv throughput on TPU at
    ~1e-6 relative error. None keeps the dtype-derived parity policy."""
    if precision in ("32_fast", "tf32", "fp32_fast"):
        return "high"
    return None


class StyleTransferModel:
    """Holds module definitions + configs; produces the initial GANTrainState."""

    def __init__(
        self,
        generator_config: Dict[str, Any],
        discriminator_config: Optional[Dict[str, Any]],
        training_config: Dict[str, Any],
        optimizer_config: Dict[str, Any],
        data_config: Dict[str, Any],
        perception_loss_config: Optional[Dict[str, Any]] = None,
    ):
        generator_config = to_container(generator_config)
        discriminator_config = (
            to_container(discriminator_config)
            if discriminator_config is not None else None
        )
        self.training_config = to_container(training_config)
        self.optimizer_config = to_container(optimizer_config)
        self.data_config = to_container(data_config)
        perception_loss_config = (
            to_container(perception_loss_config)
            if perception_loss_config else None
        )

        self.additional_channels = self.data_config.get("additional_channels") or {}
        validate_additional_channels(self.additional_channels)
        self.dtype = _resolve_dtype(self.training_config.get("precision", 32))
        self.conv_precision = _resolve_conv_precision(
            self.training_config.get("precision", 32))

        # fail fast on unknown criteria (the reference defers to getattr(nn,·)
        # at construction too, lightning_model.py:48-54)
        from patch_toon_tpu.train.losses import get_criterion

        get_criterion(self.training_config.get("reconstruction_criterion",
                                               "L1Loss"))
        get_criterion(self.training_config.get("adversarial_criterion",
                                               "MSELoss"))

        # "auto" input-channel resolution (lightning_model.py:128-157)
        g_args = dict(generator_config.get("args", {}))
        if g_args.get("input_channels") == "auto":
            g_args["input_channels"] = calculate_total_channels(self.additional_channels)
        elif g_args.get("input_channels") is None:
            g_args["input_channels"] = 3
        d_args = dict(discriminator_config.get("args", {})) if discriminator_config else None
        if d_args is not None:
            if d_args.get("input_channels") == "auto":
                d_args["input_channels"] = calculate_total_channels(self.additional_channels)
            elif d_args.get("input_channels") is None:
                d_args["input_channels"] = 3

        g_args.pop("additional_channels", None)
        if "filters" in g_args:
            g_args["filters"] = tuple(g_args["filters"])
        self.generator_args = g_args
        self.generator = GeneratorJ(dtype=self.dtype,
                                    conv_precision=self.conv_precision,
                                    **g_args)

        self.discriminator = None
        self.discriminator_args = None
        if d_args is not None:
            d_args.pop("additional_channels", None)
            self.discriminator_args = d_args
            self.discriminator = DiscriminatorN_IN(
                dtype=self.dtype, conv_precision=self.conv_precision,
                **d_args)

        self.perception = None
        self.perception_weight = 0.0
        self.perception_args = None
        if perception_loss_config:
            p_args = dict(perception_loss_config["perception_model"].get("args", {}))
            self.perception_args = p_args
            self.perception_weight = float(perception_loss_config["weight"])
            self.perception = PerceptualVGG19(
                feature_layers=tuple(p_args.get("feature_layers", (0, 3, 5))),
                use_normalization=bool(p_args.get("use_normalization", True)),
                dtype=self.dtype,
            )

        self.input_channels = int(g_args["input_channels"])

        clip = (
            float(self.training_config.get("gradient_clip_val", 0.5))
            if self.training_config.get("use_gradient_clipping", False) else None
        )
        accumulate = int(self.training_config.get("accumulate_grad_batches", 1))
        self.tx_g = optim.from_config(
            self.optimizer_config["generator"], clip_norm=clip,
            accumulate_steps=accumulate,
        )
        self.tx_d = (
            optim.from_config(
                self.optimizer_config["discriminator"], clip_norm=clip,
                accumulate_steps=accumulate,
            )
            if self.discriminator is not None else None
        )

    # ------------------------------------------------------------------

    def init_state(self, rng: jax.Array, patch_size: Optional[int] = None) -> GANTrainState:
        ps = int(patch_size or self.data_config.get("patch_size", 80))
        kg, kd = jax.random.split(rng)
        dummy = jnp.zeros((1, ps, ps, self.input_channels), jnp.float32)
        g_vars = self.generator.init(kg, dummy, train=True)
        g_params = g_vars["params"]
        g_batch_stats = g_vars.get("batch_stats", {})

        d_params = None
        d_opt = None
        if self.discriminator is not None:
            d_in = int(self.discriminator_args["input_channels"])
            d_vars = self.discriminator.init(
                kd, jnp.zeros((1, ps, ps, d_in), jnp.float32)
            )
            d_params = d_vars["params"]
            d_opt = self.tx_d.init(d_params)

        vgg_params = None
        if self.perception is not None:
            vgg_params = init_vgg_params(
                self.perception.feature_layers,
                weights_path=self.perception_args.get("path"),
            )["params"]

        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_batch_stats=g_batch_stats,
            g_opt=self.tx_g.init(g_params),
            d_params=d_params,
            d_opt=d_opt,
            vgg_params=vgg_params,
        )

    # -- checkpoint interop ------------------------------------------------

    def load_torch_checkpoint(self, state: GANTrainState, ckpt_path: str) -> GANTrainState:
        """Load a reference-framework torch ``.ckpt`` into this state.

        Mirrors reference generator.py:115-182 (including the channel-count
        self-description: the caller should have built the model with
        ``input_channels`` sniffed from the checkpoint).
        """
        import torch

        from patch_toon_tpu.utils.torch_compat import (
            discriminator_params_from_torch,
            generator_params_from_torch,
        )

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
        g_params, g_stats = generator_params_from_torch(
            sd,
            resnet_blocks=int(self.generator_args.get("resnet_blocks", 7)),
            norm_layer=self.generator_args.get("norm_layer", "instance_norm"),
            append_smoothers=bool(self.generator_args.get("append_smoothers", True)),
            prefix="generator.",
        )
        updates = {"g_params": g_params, "g_batch_stats": g_stats}
        if self.discriminator is not None and any(
            k.startswith("discriminator.") for k in sd
        ):
            updates["d_params"] = discriminator_params_from_torch(
                sd, n_layers=int(self.discriminator_args.get("n_layers", 3)),
                prefix="discriminator.",
            )
        return state.replace(**jax.tree.map(jnp.asarray, updates))
