#!/usr/bin/env python
"""Long-horizon training-stability soak (VERDICT r4 missing #3).

The reference's own default budget is 50 epochs (reference
config/training/default.yaml:4) — tens of thousands of steps on a real
scene. All prior runs here were <= 2000 steps; nothing showed losses stay
finite, top-3 checkpoint rotation/scoring behaves, and mid-run resume
works at that scale. This driver runs the shipped train.py CLI (no
private hooks) on the REAL reference scene in two legs:

  leg 1: steps 0      -> --split   (fresh run)
  leg 2: --split      -> --steps   (training.resume_from=<leg1 last>)

At batch 80 the real scene is ~8.1k steps/epoch, so --steps 33000 crosses
five epoch checkpoints — top-3 rotation must prune epochs as scores
improve. Precision bf16 = the production-throughput mode (also the most
numerically fragile, so finite losses here are the strongest stability
claim). Writes docs/train_soak/soak.json {per-epoch losses, pps, ckpt
listing before/after rotation} + copies the loss curve out of the TB
events + stylizes one frame with the final checkpoint.
"""

from __future__ import annotations

import argparse
import glob
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SCENE = Path("/root/reference/test_dataset/PlatinumChan_x0.5_train")


def run_leg(out_dir: Path, steps: int, resume: str | None) -> float:
    ov = [
        f"data.dir_pre={SCENE}/input",
        f"data.dir_post={SCENE}/output",
        f"data.dir_mask={SCENE}/mask",
        f"data.additional_channels.point_vector.path={SCENE}/tracking",
        "training.batch_size=80",
        "training.precision=bf16",
        "training.max_epochs=50",
        f"+training.max_steps={steps}",
        "training.early_stopping=false",
        "training.image_log_freq=1000000",
        f"training.output_dir={out_dir}",
        f"run.dir={out_dir}/run",
    ]
    if resume:
        ov.append(f"training.resume_from={resume}")
    t0 = time.perf_counter()
    subprocess.run([sys.executable, str(REPO / "train.py")] + ov,
                   check=True, cwd=str(REPO))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=33000)
    ap.add_argument("--split", type=int, default=16000)
    ap.add_argument("--out", default=str(REPO / "docs" / "train_soak"))
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    t1 = run_leg(out, args.split, None)
    ckpts_mid = sorted(p.name for p in (out / "run/checkpoints").iterdir())
    print(f"[soak] leg 1 done in {t1:.0f}s; checkpoints: {ckpts_mid}",
          flush=True)
    t2 = run_leg(out, args.steps, str(out / "run/checkpoints/last"))
    ckpts_end = sorted(p.name for p in (out / "run/checkpoints").iterdir())
    print(f"[soak] leg 2 done in {t2:.0f}s; checkpoints: {ckpts_end}",
          flush=True)

    # pull the scalar series out of the TB events (loss curve evidence)
    from tensorboard.backend.event_processing.event_file_loader import \
        EventFileLoader
    series: dict[str, list] = {}
    for f in glob.glob(str(out / "run/tb/events*")):
        for ev in EventFileLoader(f).Load():
            if not ev.HasField("summary"):
                continue
            for v in ev.summary.value:
                if v.HasField("simple_value"):
                    series.setdefault(v.tag, []).append(
                        [int(ev.step), float(v.simple_value)])
    for k in series:
        series[k].sort()
    g = series.get("g_total_loss", [])
    finite = all(abs(x) < 1e6 and x == x for _, x in g)
    pps = [x for _, x in series.get("patches_per_sec", [])]

    # stylize one frame with the final checkpoint
    subprocess.run([
        sys.executable, str(REPO / "generator.py"),
        f"paths.checkpoint={out}/run/checkpoints/last",
        f"paths.input_dir={SCENE}/input",
        f"paths.mask_dir={SCENE}/mask",
        f"paths.output_dir={out}/styl",
        f"paths.additional_channels.point_vector.path={SCENE}/tracking",
    ], check=True, cwd=str(REPO))

    summary = {
        "steps": args.steps, "split": args.split, "batch": 80,
        "precision": "bf16", "leg1_s": round(t1, 1), "leg2_s": round(t2, 1),
        "ckpts_after_leg1": ckpts_mid, "ckpts_final": ckpts_end,
        "losses_finite": finite,
        "g_total_loss_first": g[0] if g else None,
        "g_total_loss_last": g[-1] if g else None,
        "epoch_g_total_loss": series.get("epoch_g_total_loss", []),
        "patches_per_sec": [round(x, 1) for x in pps],
        "n_scalar_points": {k: len(v) for k, v in series.items()},
    }
    (out / "soak.json").write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps({k: summary[k] for k in
                      ("losses_finite", "ckpts_final", "patches_per_sec")}))


if __name__ == "__main__":
    main()
