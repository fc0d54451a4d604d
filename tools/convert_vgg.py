#!/usr/bin/env python
"""Convert VGG19 pretrained weights to the framework's ``.npz`` format.

The reference downloads torchvision's VGG19 at run time
(src/models/perception.py:50); this zero-egress build instead loads weights
from a user-supplied file once and converts them:

    # from a torchvision state dict (.pth) saved elsewhere:
    python tools/convert_vgg.py --from-state-dict vgg19.pth --out vgg19.npz

    # or, where torchvision + network access exist:
    python tools/convert_vgg.py --download --out vgg19.npz

Point ``model.perception_loss.perception_model.args.path`` at the ``.npz``.
Arrays are stored as ``features.<i>.weight`` (OIHW) / ``features.<i>.bias``,
matching torchvision's ``vgg19.features`` indexing.
"""

from __future__ import annotations

import argparse

import numpy as np


def convert_state_dict(sd: dict, out_path: str, max_index: int = 36) -> None:
    arrays = {}
    for key, value in sd.items():
        k = key
        for prefix in ("model.features.", "features."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        else:
            continue
        idx, kind = k.split(".", 1)
        if int(idx) <= max_index and kind in ("weight", "bias"):
            arrays[f"features.{idx}.{kind}"] = np.asarray(
                value.detach().cpu().numpy()
                if hasattr(value, "detach") else value)
    if not arrays:
        raise ValueError("No features.* conv arrays found in state dict")
    np.savez(out_path, **arrays)
    print(f"Wrote {len(arrays)} arrays to {out_path}")


def main() -> None:
    parser = argparse.ArgumentParser(description="VGG19 weight converter")
    parser.add_argument("--from-state-dict", help="torch .pth state dict path")
    parser.add_argument("--download", action="store_true",
                        help="download via torchvision (needs network)")
    parser.add_argument("--out", required=True, help="output .npz path")
    parser.add_argument("--max-index", type=int, default=36,
                        help="highest features index to keep")
    args = parser.parse_args()

    if args.download:
        from torchvision.models import vgg19

        sd = vgg19(weights="IMAGENET1K_V1").state_dict()
    elif args.from_state_dict:
        import torch

        sd = torch.load(args.from_state_dict, map_location="cpu",
                        weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
    else:
        parser.error("need --from-state-dict or --download")
    convert_state_dict(sd, args.out, args.max_index)


if __name__ == "__main__":
    main()
