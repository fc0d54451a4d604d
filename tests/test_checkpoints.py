"""Checkpoint manager tests: retention, meta, resume, channel sniff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patch_toon_tpu.train import StyleTransferModel, make_train_step
from patch_toon_tpu.train.checkpoints import (
    CheckpointManager,
    restore_generator,
    sniff_input_channels,
)


@pytest.fixture(scope="module")
def tiny_model():
    return StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(
            input_channels=4, use_bias=True, resnet_blocks=1,
            filters=[4, 8, 8, 8, 8, 4])},
        discriminator_config={"type": "DiscriminatorN_IN", "args": dict(
            num_filters=4, n_layers=2, use_bias=True, input_channels=3)},
        training_config=dict(
            batch_size=4, reconstruction_weight=4.0, adversarial_weight=0.5,
            use_image_loss=True, reconstruction_criterion="L1Loss",
            adversarial_criterion="MSELoss", precision=32),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
            discriminator=dict(lr=4e-4, betas=[0.9, 0.999],
                               weight_decay=1e-5)),
        data_config=dict(patch_size=16, additional_channels={
            "x": {"path": "unused", "depth": 1}}),
        perception_loss_config=None,
    )


def test_topk_retention_and_last(tiny_model, tmp_path):
    state = tiny_model.init_state(jax.random.PRNGKey(0), patch_size=16)
    mgr = CheckpointManager(tmp_path / "ckpts", keep_top_k=3,
                            meta={"input_channels": 4})
    scores = [5.0, 3.0, 4.0, 1.0, 2.0]
    for epoch, score in enumerate(scores):
        mgr.save(state, epoch, score)
    kept = sorted(p.name for p in (tmp_path / "ckpts").iterdir())
    # top-3 scores are epochs 3 (1.0), 4 (2.0), 1 (3.0) + 'last'
    assert "last" in kept
    epochs = [k for k in kept if k.startswith("epoch")]
    assert epochs == ["epoch_0001", "epoch_0003", "epoch_0004"]
    meta = CheckpointManager.read_meta(tmp_path / "ckpts" / "last")
    assert meta["input_channels"] == 4
    assert meta["epoch"] == 4


def test_topk_retention_survives_restart(tiny_model, tmp_path):
    """A new manager over an existing dir rebuilds scores from meta.json,
    so pre-restart epochs keep participating in top-k pruning."""
    state = tiny_model.init_state(jax.random.PRNGKey(0), patch_size=16)
    mgr = CheckpointManager(tmp_path / "cr", keep_top_k=3)
    for epoch, score in enumerate([5.0, 3.0, 4.0]):
        mgr.save(state, epoch, score)

    # simulate a resume: fresh manager instance over the same directory
    mgr2 = CheckpointManager(tmp_path / "cr", keep_top_k=3)
    assert mgr2._scores == {"epoch_0000": 5.0, "epoch_0001": 3.0,
                            "epoch_0002": 4.0}
    mgr2.save(state, 3, 1.0)  # should evict the worst PRE-resume epoch (5.0)
    mgr2.save(state, 4, 2.0)  # should evict the next worst (4.0)
    epochs = sorted(p.name for p in (tmp_path / "cr").iterdir()
                    if p.name.startswith("epoch"))
    assert epochs == ["epoch_0001", "epoch_0003", "epoch_0004"]


def test_resume_roundtrip(tiny_model, tmp_path):
    state = tiny_model.init_state(jax.random.PRNGKey(0), patch_size=16)
    step = make_train_step(tiny_model, donate=False)
    batch = {"pre": jnp.zeros((4, 16, 16, 3)),
             "post": jnp.zeros((4, 16, 16, 3)),
             "channels": jnp.zeros((4, 16, 16, 1))}
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    mgr = CheckpointManager(tmp_path / "c2", keep_top_k=3)
    mgr.save(state, 0, 1.23)

    fresh = tiny_model.init_state(jax.random.PRNGKey(42), patch_size=16)
    restored = CheckpointManager.restore(str(tmp_path / "c2" / "last"), fresh)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored.g_params),
                    jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state (Adam moments) must survive the roundtrip
    for a, b in zip(jax.tree.leaves(restored.g_opt),
                    jax.tree.leaves(state.g_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state without error
    restored, metrics = step(restored, batch, jax.random.PRNGKey(9))
    assert int(restored.step) == 4


def test_sniff_and_generator_restore(tiny_model, tmp_path):
    state = tiny_model.init_state(jax.random.PRNGKey(0), patch_size=16)
    mgr = CheckpointManager(tmp_path / "c3", keep_top_k=1,
                            meta={"input_channels": 4})
    mgr.save(state, 0, 1.0)
    assert sniff_input_channels(str(tmp_path / "c3" / "last")) == 4
    g_params, g_stats = restore_generator(str(tmp_path / "c3" / "last"))
    assert "initial_conv" in g_params
    kernel = np.asarray(g_params["initial_conv"]["conv"]["kernel"])
    assert kernel.shape[2] == 4  # HWIO input channels
