#!/usr/bin/env python
"""Export a patch-toon-tpu orbax checkpoint to the reference ``.ckpt`` format.

Completes the interop round trip (the other direction — bringing reference
torch checkpoints into this build — is tools/convert_checkpoint.py /
utils/torch_compat.py): a checkpoint trained on TPU by this framework becomes
a lightning-layout ``{"state_dict": {...}}`` file that the reference's
inference loads verbatim (reference generator.py:115-180: channel sniff on
``generator.initial_conv.0.weight``, then ``load_state_dict(...,
strict=True)`` into its ``StyleTransferModel``).

Modes:

- default: export ``generator.*`` (+ ``discriminator.*`` when the checkpoint
  carries one) — everything this build trains.
- ``--full-reference-model``: additionally emit the
  ``perception_loss_model.*`` subtree the reference's strict load demands
  when its config enables the perceptual loss (the default). The VGG feature
  layers this build actually trained against (deterministic
  ``init_vgg_params``, or ``--vgg-npz`` weights) are embedded; the remaining
  VGG19 features/classifier — which the reference never touches at
  inference — are zero filler (~0.55 GB fp32; pass ``--vgg-npz`` from
  tools/convert_vgg.py to embed real features). ``--num-classes`` selects
  the classifier head shape: omit for the torchvision default (1000,
  reference perception_model ``path: null``), or match the reference's
  custom-head path (perception.py:38-46, 512*8*8 input, default 40).

Usage:
    python tools/export_checkpoint.py RUN/checkpoints/last out.ckpt
    python tools/export_checkpoint.py RUN/checkpoints/last out.ckpt \
        --full-reference-model [--num-classes 40] [--vgg-npz vgg19.npz]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# torchvision vgg19 ('E' cfg) features: conv index -> (out_ch, in_ch).
VGG19_FEATURE_CONVS = {
    0: (64, 3), 2: (64, 64),
    5: (128, 64), 7: (128, 128),
    10: (256, 128), 12: (256, 256), 14: (256, 256), 16: (256, 256),
    19: (512, 256), 21: (512, 512), 23: (512, 512), 25: (512, 512),
    28: (512, 512), 30: (512, 512), 32: (512, 512), 34: (512, 512),
}


def _vgg_filler(num_classes: int | None) -> dict:
    """Zero-filled full-VGG19 skeleton (reference perception.py:33-52).

    Only shapes matter: the reference's inference never runs the perception
    model, but its strict load requires every key to exist."""
    sd = {}
    for idx, (o, i) in VGG19_FEATURE_CONVS.items():
        sd[f"model.features.{idx}.weight"] = np.zeros((o, i, 3, 3), np.float32)
        sd[f"model.features.{idx}.bias"] = np.zeros((o,), np.float32)
    if num_classes is None:
        dims = [(4096, 512 * 7 * 7), (4096, 4096), (1000, 4096)]
    else:
        # custom head the reference builds when perception path is set
        dims = [(4096, 512 * 8 * 8), (4096, 4096), (num_classes, 4096)]
    for li, (o, i) in zip((0, 3, 6), dims):
        sd[f"model.classifier.{li}.weight"] = np.zeros((o, i), np.float32)
        sd[f"model.classifier.{li}.bias"] = np.zeros((o,), np.float32)
    sd["mean"] = np.array([0.485, 0.456, 0.406],
                          np.float32).reshape(1, 3, 1, 1)
    sd["std"] = np.array([0.229, 0.224, 0.225],
                         np.float32).reshape(1, 3, 1, 1)
    return sd


def export_checkpoint(ckpt_dir: str, out_path: str,
                      full_reference_model: bool = False,
                      num_classes: int | None = None,
                      vgg_npz: str | None = None,
                      feature_layers=(0, 3, 5)) -> dict:
    """Build the reference-layout checkpoint dict and torch.save it."""
    import jax

    # exporting is a host-side format conversion — never grab a TPU (the
    # axon plugin prepends itself to jax_platforms; first tunnel compile
    # is 100s+, see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp
    import torch

    from patch_toon_tpu.models.perception import init_vgg_params
    from patch_toon_tpu.utils import torch_compat as tc

    p = Path(ckpt_dir).absolute()
    ckptr = ocp.StandardCheckpointer()
    # the saved sharding metadata names the WRITER's devices (often a TPU);
    # restore against abstract targets pinned to the local CPU instead
    # (same device-independence trick as train.checkpoints.restore_generator)
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    abstract = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        dict(ckptr.metadata(p).item_metadata),
    )
    restored = ckptr.restore(p, abstract)
    meta_file = p / "meta.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    gargs = meta.get("generator_args", {})
    dargs = meta.get("discriminator_args", {})
    step = int(np.asarray(restored.get("step", 0)))

    sd = {}
    gen = tc.generator_params_to_torch(
        restored["g_params"], restored.get("g_batch_stats", {}),
        resnet_blocks=int(gargs.get("resnet_blocks", 7)),
        norm_layer=gargs.get("norm_layer", "instance_norm"),
        append_smoothers=bool(gargs.get("append_smoothers", True)),
        # the reference BN counter advances twice per training step
        num_batches_tracked=2 * step,
    )
    sd.update({f"generator.{k}": v for k, v in gen.items()})

    if "d_params" in restored:
        disc = tc.discriminator_params_to_torch(
            restored["d_params"], n_layers=int(dargs.get("n_layers", 3)))
        sd.update({f"discriminator.{k}": v for k, v in disc.items()})

    if full_reference_model:
        vsd = _vgg_filler(num_classes)
        vgg = init_vgg_params(tuple(feature_layers), weights_path=vgg_npz)
        trained = tc.vgg_params_to_torch(vgg["params"])
        for k, v in trained.items():
            assert k in vsd and vsd[k].shape == v.shape, k
            vsd[k] = np.asarray(v, np.float32)
        sd.update({f"perception_loss_model.{k}": v for k, v in vsd.items()})

    out = {
        "state_dict": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
        "epoch": int(meta.get("epoch", 0)),
        "global_step": step,
    }
    torch.save(out, out_path)
    mb = Path(out_path).stat().st_size / 1e6
    print(f"Exported {len(sd)} tensors ({mb:.1f} MB) -> {out_path}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Export an orbax checkpoint to the reference .ckpt layout")
    ap.add_argument("checkpoint", help="orbax checkpoint dir (.../last)")
    ap.add_argument("output", help="output .ckpt path")
    ap.add_argument("--full-reference-model", action="store_true",
                    help="emit perception_loss_model.* for strict=True "
                         "loads of the full reference model")
    ap.add_argument("--num-classes", type=int, default=None,
                    help="custom VGG classifier head (reference "
                         "perception path mode); omit for torchvision "
                         "layout")
    ap.add_argument("--vgg-npz", default=None,
                    help="embed real VGG19 features from a "
                         "tools/convert_vgg.py .npz")
    ap.add_argument("--feature-layers", type=int, nargs="+",
                    default=[0, 3, 5],
                    help="perception feature layers the run trained with")
    args = ap.parse_args()
    export_checkpoint(args.checkpoint, args.output,
                      full_reference_model=args.full_reference_model,
                      num_classes=args.num_classes, vgg_npz=args.vgg_npz,
                      feature_layers=args.feature_layers)


if __name__ == "__main__":
    main()
