#!/usr/bin/env python
"""Convert a reference-framework torch ``.ckpt`` to an orbax checkpoint.

Lets reference users carry trained models into this TPU build once, instead
of re-converting at every inference start (generator.py also accepts .ckpt
directly). Channel count and architecture args are sniffed from the
checkpoint, mirroring reference generator.py:115-129.

    python tools/convert_checkpoint.py last.ckpt outputs/converted/last
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser(description="torch .ckpt -> orbax")
    parser.add_argument("ckpt", help="reference .ckpt path")
    parser.add_argument("out", help="output orbax checkpoint directory")
    parser.add_argument("--resnet-blocks", type=int, default=7)
    parser.add_argument("--patch-size", type=int, default=80)
    args = parser.parse_args()

    import jax
    import torch

    from patch_toon_tpu.train.checkpoints import CheckpointManager
    from patch_toon_tpu.train.model import StyleTransferModel
    from patch_toon_tpu.utils.torch_compat import (
        generator_input_channels_from_torch,
    )

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    channels = generator_input_channels_from_torch(ckpt["state_dict"])
    print(f"Checkpoint input channels: {channels}")

    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(
            input_channels=channels, use_bias=True, tanh=True,
            append_smoothers=True, resnet_blocks=args.resnet_blocks,
            filters=[32, 64, 128, 128, 128, 64],
            norm_layer="instance_norm")},
        discriminator_config=None,
        training_config=dict(
            batch_size=1, reconstruction_weight=4.0, adversarial_weight=0.5,
            use_image_loss=True, reconstruction_criterion="L1Loss",
            adversarial_criterion="MSELoss", precision=32),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5)),
        data_config=dict(patch_size=args.patch_size, additional_channels={}),
        perception_loss_config=None,
    )
    state = model.init_state(jax.random.PRNGKey(0),
                             patch_size=args.patch_size)
    state = model.load_torch_checkpoint(state, args.ckpt)

    out = Path(args.out).absolute()
    mgr = CheckpointManager(out.parent, keep_top_k=1000,
                            meta={"input_channels": channels,
                                  "source": str(args.ckpt)})
    mgr._write(out.name, state, {})
    print(f"Wrote orbax checkpoint to {out}")


if __name__ == "__main__":
    main()
