"""Config-validation and error-path tests (reference's runtime validation
surface: lightning_model.py:90-115, generator.py:120-129,196-271)."""

import numpy as np
import pytest

import jax

from patch_toon_tpu.train.model import (
    StyleTransferModel,
    calculate_total_channels,
    validate_additional_channels,
)


def test_auto_channel_resolution():
    assert calculate_total_channels(None) == 3
    assert calculate_total_channels(
        {"a": {"path": "/x", "depth": 3}, "b": {"path": "/y", "depth": 1}}
    ) == 7
    assert calculate_total_channels({"legacy": "/plain/string"}) == 4


def test_channel_schema_validation():
    with pytest.raises(ValueError, match="'path' is required"):
        validate_additional_channels({"bad": {"depth": 3}})
    with pytest.raises(ValueError, match="positive integer"):
        validate_additional_channels({"bad": {"path": "/x", "depth": 0}})
    validate_additional_channels({"ok": {"path": "/x", "depth": 2}})


def test_unknown_criterion_rejected():
    with pytest.raises(ValueError, match="Unknown criterion"):
        StyleTransferModel(
            generator_config={"type": "GeneratorJ", "args": dict(
                input_channels=3, use_bias=True, resnet_blocks=1,
                filters=[4, 8, 8, 8, 8, 4])},
            discriminator_config=None,
            training_config=dict(
                batch_size=4, reconstruction_weight=4.0,
                adversarial_weight=0.5, use_image_loss=True,
                reconstruction_criterion="NopeLoss",
                adversarial_criterion="MSELoss", precision=32),
            optimizer_config=dict(
                generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=0)),
            data_config=dict(patch_size=16, additional_channels={}),
        ).init_state(jax.random.PRNGKey(0), patch_size=16)


def test_checkpoint_channel_mismatch(tmp_path):
    """generator.py:120-129 parity: mismatched channels must raise."""
    from patch_toon_tpu.train.checkpoints import CheckpointManager

    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(
            input_channels=6, use_bias=True, resnet_blocks=1,
            filters=[4, 8, 8, 8, 8, 4])},
        discriminator_config=None,
        training_config=dict(
            batch_size=4, reconstruction_weight=4.0, adversarial_weight=0.5,
            use_image_loss=True, reconstruction_criterion="L1Loss",
            adversarial_criterion="MSELoss", precision=32),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=0)),
        data_config=dict(patch_size=16, additional_channels={}),
    )
    state = model.init_state(jax.random.PRNGKey(0), patch_size=16)
    mgr = CheckpointManager(tmp_path / "c", keep_top_k=1,
                            meta={"input_channels": 6})
    mgr.save(state, 0, 1.0)

    from patch_toon_tpu.config import ConfigNode, compose
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    icfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={tmp_path}/c/last",
        "paths.additional_channels={}",   # 3 channels vs checkpoint's 6
        "inference.use_gpu=false",
    ])
    from patch_toon_tpu.infer import StyleTransferInference

    with pytest.raises(ValueError, match="Channel count mismatch"):
        StyleTransferInference(icfg)
