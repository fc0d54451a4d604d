#!/usr/bin/env python
"""Train-step throughput (patches/s) vs batch size on TPU.

The inference bucket sweep (docs/perf/bucket_sweep_r3.json) showed the
generator runs ~2x slower per tile at batches that are not multiples of
128. The reference's training batch is 80 (config/training/default.yaml:5)
— this sweep asks whether the full GAN train step shares that cliff, i.e.
whether `training.batch_size=128` is a free throughput recipe for users
who aren't pinned to reference parity. Timing: the sequential state chain
serializes steps; one scalar fetch syncs (bench.py bench_training
methodology, which this reuses with a batch-size parameter).

Usage: python tools/profile_train_batch.py [sizes...]
Writes docs/perf/train_batch_sweep_r3.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

DEFAULT = [64, 80, 96, 128, 256]


def patches_per_sec(batch_size: int, steps: int = 30) -> float:
    from patch_toon_tpu.train import StyleTransferModel, make_train_step

    ps = 80
    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(
            input_channels=6, use_bias=True, tanh=True,
            append_smoothers=True, resnet_blocks=7,
            filters=[32, 64, 128, 128, 128, 64])},
        discriminator_config={"type": "DiscriminatorN_IN", "args": dict(
            num_filters=12, n_layers=2, use_noise=False,
            norm_layer="instance_norm", use_bias=True, input_channels=3)},
        training_config=dict(
            batch_size=batch_size, reconstruction_weight=4.0,
            adversarial_weight=0.5, use_image_loss=True,
            reconstruction_criterion="L1Loss",
            adversarial_criterion="MSELoss",
            use_gradient_clipping=True, gradient_clip_val=0.5,
            precision="bf16"),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
            discriminator=dict(lr=4e-4, betas=[0.9, 0.999],
                               weight_decay=1e-5)),
        data_config=dict(patch_size=ps, additional_channels={
            "point_vector": {"path": "unused", "depth": 3}}),
        perception_loss_config={
            "weight": 6.0,
            "perception_model": {"type": "PerceptualVGG19", "args": {
                "feature_layers": [0, 3, 5], "use_normalization": False,
                "path": None}}},
    )
    state = model.init_state(jax.random.PRNGKey(0), patch_size=ps)
    step = make_train_step(model)
    rng = jax.random.PRNGKey(1)
    batch = {
        "pre": jax.random.uniform(rng, (batch_size, ps, ps, 3)) * 2 - 1,
        "post": jax.random.uniform(rng, (batch_size, ps, ps, 3)) * 2 - 1,
        "channels": jax.random.uniform(rng, (batch_size, ps, ps, 3)) * 2 - 1,
    }
    state, metrics = step(state, batch, rng)  # compile
    float(metrics["g_total_loss"])
    for i in range(5):
        state, metrics = step(state, batch, jax.random.fold_in(rng, 1000 + i))
    float(metrics["g_total_loss"])
    rates = []
    for r in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step(state, batch,
                                  jax.random.fold_in(rng, 100 * r + i))
        float(metrics["g_total_loss"])
        rates.append(steps * batch_size / (time.perf_counter() - t0))
    return float(np.median(rates))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or DEFAULT
    out = {}
    for b in sizes:
        out[b] = patches_per_sec(b)
        print(f"batch {b:4d}: {out[b]:8.0f} patches/s "
              f"({out[b] / b:.2f} steps/s)", flush=True)
    path = Path(__file__).resolve().parents[1] / \
        "docs/perf/train_batch_sweep_r3.json"
    path.write_text(json.dumps({"patches_per_sec": out, "ps": 80},
                               indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
