#!/usr/bin/env python
"""Record golden outputs for cross-round numeric regression tests.

Writes tests/goldens/goldens.npz: the full tiled-inference output for a
fixed random generator + frame, and the loss trajectory of 5 fixed GAN train
steps — both on CPU fp32 so they are stable across TPU topology changes.
Run once after any INTENTIONAL numerics change; tests/test_goldens.py
fails if behavior drifts unintentionally.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

GOLDEN_PATH = Path(__file__).resolve().parents[1] / "tests" / "goldens" / "goldens.npz"


def compute_goldens() -> dict:
    from patch_toon_tpu.infer.engine import make_frame_fn
    from patch_toon_tpu.infer.tiling import (
        bucket_size, pack_boxes, tile_boxes_from_mask)
    from patch_toon_tpu.models import GeneratorJ
    from patch_toon_tpu.train import StyleTransferModel, make_train_step

    out = {}

    # --- inference golden: full tiled pipeline, fixed seed ---------------
    ps, h, w, c = 16, 48, 64, 3
    gen = GeneratorJ(input_channels=3, use_bias=True, resnet_blocks=2,
                     filters=(4, 8, 8, 8, 8, 4))
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 3)))
    frame = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (h, w, c))) * 2 - 1
    mask = np.zeros((h, w), np.float32)
    mask[8:40, 10:56] = 1.0
    boxes = tile_boxes_from_mask(mask, ps, 30.0)
    pb, wts, _ = pack_boxes(boxes, ps, bucket_size(len(boxes)))
    fn = make_frame_fn(gen, ps, pb.shape[0], h, w, c, jnp.float32)
    u8, _ = fn(g_vars, jnp.asarray(frame), jnp.asarray(pb),
               jnp.asarray(wts), jnp.asarray(mask[..., None]))
    out["inference_frame"] = np.asarray(u8)

    # --- training golden: 5 fixed GAN steps -------------------------------
    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(
            input_channels=3, use_bias=True, resnet_blocks=1,
            filters=[4, 8, 8, 8, 8, 4])},
        discriminator_config={"type": "DiscriminatorN_IN", "args": dict(
            num_filters=4, n_layers=2, use_bias=True, input_channels=3)},
        training_config=dict(
            batch_size=8, reconstruction_weight=4.0, adversarial_weight=0.5,
            use_image_loss=True, reconstruction_criterion="L1Loss",
            adversarial_criterion="MSELoss",
            use_gradient_clipping=True, gradient_clip_val=0.5, precision=32),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
            discriminator=dict(lr=4e-4, betas=[0.9, 0.999],
                               weight_decay=1e-5)),
        data_config=dict(patch_size=16, additional_channels={}),
        perception_loss_config={
            "weight": 6.0,
            "perception_model": {"type": "PerceptualVGG19", "args": {
                "feature_layers": [0, 3, 5], "use_normalization": False,
                "path": None}}},
    )
    state = model.init_state(jax.random.PRNGKey(0), patch_size=16)
    step = make_train_step(model, donate=False)
    batch = {
        "pre": jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 16, 3)) * 2 - 1,
        "post": jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3)) * 2 - 1,
    }
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append([float(metrics["g_total_loss"]),
                       float(metrics["d_total_loss"])])
    out["training_losses"] = np.asarray(losses, np.float32)
    return out


def main() -> None:
    goldens = compute_goldens()
    GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
    np.savez(GOLDEN_PATH, **goldens)
    print(f"Recorded goldens to {GOLDEN_PATH}")
    for k, v in goldens.items():
        print(f"  {k}: shape {v.shape}")


if __name__ == "__main__":
    main()
