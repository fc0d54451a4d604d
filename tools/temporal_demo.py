#!/usr/bin/env python
"""End-to-end demonstration that the temporal-guide mode reduces flicker.

VERDICT r2 #3: the temporal capability (extra input channels carrying the
flow-warped previous *stylized* frame, chained at inference) was parity- and
plumbing-tested but never demonstrated. This tool produces the evidence:

  1. synthesize a moving scene (make_sample_scene blobs) and add
     per-frame sensor noise to the inputs — the classic source of video
     flicker for a memoryless per-frame stylizer;
  2. compute flows (tools/optical_flow.py) and training-time temporal
     guides (tools/temporal_guide.py);
  3. train TWO checkpoints, same budget: PLAIN (RGB-only input) and
     TEMPORAL (RGB + 3 temporal-guide channels);
  4. stylize the sequence with each (temporal one chains its own previous
     output through inference.temporal.enabled);
  5. report, inside the mask, per-sequence
       flicker  = mean_i mean|out_i - warp(out_{i-1}, flow_i)|   (lower = stabler)
       warped PSNR = PSNR(out_i, warp(out_{i-1}, flow_i))        (higher = stabler)
       target PSNR = PSNR(out_i, target_i)                        (quality check)
     for the plain run, the temporal run, and the input sequence itself
     (the flicker floor induced by the noise), into docs/temporal/.

Run:  python tools/temporal_demo.py [--steps 600] [--out docs/temporal]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def build_scene(scene: Path, frames: int, h: int, w: int,
                noise: float) -> None:
    """Clean scene for training/flows; a noisy COPY of the inputs for
    serving. Noise only at inference isolates the question being tested —
    does the temporal chain suppress per-frame input variation? — and
    keeps the flows (computed from clean frames) accurate."""
    from make_sample_scene import make_scene

    make_scene(str(scene), frames=frames, height=h, width=w, seed=5)
    (scene / "input_noisy").mkdir(exist_ok=True)
    rng = np.random.default_rng(99)
    for p in sorted((scene / "input").glob("*.png")):
        img = np.asarray(Image.open(p), np.float32)
        img = img + rng.normal(0.0, noise * 255.0, img.shape)
        Image.fromarray(
            np.clip(np.round(img), 0, 255).astype(np.uint8)
        ).save(scene / "input_noisy" / p.name)


def train_ckpt(scene: Path, run_dir: Path, steps: int, temporal: bool,
               batch: int = 32, gd_p: float = 0.0) -> Path:
    import train as train_entry
    from patch_toon_tpu.config import compose

    ckpt = run_dir / "checkpoints" / "last"
    if ckpt.exists():
        return ckpt
    over = [
        f"data.dir_pre={scene}/input",
        f"data.dir_post={scene}/output",
        f"data.dir_mask={scene}/mask",
        "data.patch_size=32",
        f"training.batch_size={batch}",
        "training.max_epochs=1000000",
        f"training.max_steps={steps}",
        "training.early_stopping=false",
        "training.image_log_freq=1000000",
        "training.log_every_n_steps=200",
        f"training.output_dir={run_dir}/out",
        f"run.dir={run_dir}",
        "model.generator.args.resnet_blocks=3",
        "model.generator.args.filters=[16,32,64,64,64,32]",
        "model.discriminator.args.num_filters=8",
    ]
    if temporal:
        over.append("data.additional_channels="
                    f"{{temporal: {{path: {scene}/temporal, depth: 3}}}}")
        if gd_p > 0.0:
            over.append(f"training.guide_dropout_p={gd_p}")
    else:
        over.append("data.additional_channels={}")
    cfg = compose(REPO / "config", "config", overrides=over)
    train_entry.train(cfg)
    return run_dir / "checkpoints" / "last"


def stylize(scene: Path, ckpt: Path, out_dir: Path, temporal: bool,
            broken_chain: bool = False) -> None:
    """``broken_chain=True`` serves the temporal checkpoint with the chain
    permanently at its start condition (no flow_dir -> guide = frame RGB on
    EVERY frame, infer/engine.py:1333) — the worst-case serving state the
    guide-dropout training knob exists to make graceful."""
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer.engine import StyleTransferInference

    n_in = len(list((scene / "input_noisy").glob("*.png")))
    if len(list(out_dir.glob("*.png"))) == n_in:
        return  # already stylized (resume)
    over = [
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={scene}/input_noisy",
        f"paths.mask_dir={scene}/mask",
        f"paths.output_dir={out_dir}",
        "paths.additional_channels={}",
        "data.patch_size=32",
        "inference.precision=32",
    ]
    if temporal:
        over += ["+inference.temporal.enabled=true",
                 "+inference.temporal.depth=3"]
        if not broken_chain:
            over.append(f"+inference.temporal.flow_dir={scene}/flow_bwd")
    cfg = compose(REPO / "config", "inference", overrides=over)
    StyleTransferInference(cfg).process_directory(progress=False)


def sequence_metrics(frames_dir: Path, scene: Path, names) -> dict:
    """Flicker + stability metrics over a stylized (or input) sequence."""
    import jax.numpy as jnp

    from patch_toon_tpu.ops.flow import warp_image

    def load(p):
        return np.asarray(Image.open(p).convert("RGB"), np.float32)

    flick, wpsnr, tpsnr = [], [], []
    prev = None
    for i, n in enumerate(names):
        cur = load(frames_dir / n)
        msk = np.asarray(Image.open(scene / "mask" / n), np.float32) > 127
        gt = load(scene / "output" / n)
        mse_t = ((cur - gt) ** 2)[msk].mean()
        tpsnr.append(10 * np.log10(255.0 ** 2 / max(mse_t, 1e-9)))
        if prev is not None:
            # flow files are indexed by POSITION in the sorted stream
            # (tools/optical_flow.py), not by the frame's filename number
            flow = np.load(str(scene / "flow_bwd" / (f"{i:03d}.npy")))
            warped = np.asarray(warp_image(
                jnp.asarray(prev / 255.0), jnp.asarray(flow))) * 255.0
            diff = np.abs(cur - warped)[msk]
            flick.append(float(diff.mean()))
            mse = float((diff ** 2).mean())
            wpsnr.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-9)))
        prev = cur
    return {"flicker_mean_abs": round(float(np.mean(flick)), 3),
            "warped_psnr_db": round(float(np.mean(wpsnr)), 2),
            "target_psnr_db": round(float(np.mean(tpsnr)), 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--guide_dropout_p", type=float, default=0.25)
    ap.add_argument("--out", default=str(REPO / "docs" / "temporal"))
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    scene = out / "scene"

    from optical_flow import OpticalFlowCalculator
    from temporal_guide import build_temporal_guides

    t0 = time.time()
    if not (scene / "input").exists():
        build_scene(scene, args.frames, args.height, args.width, args.noise)
        OpticalFlowCalculator(scene / "input", scene / "flow_fwd",
                              scene / "flow_bwd", scene / "mask",
                              backend="tpu").calculate_flows()
        build_temporal_guides(str(scene / "input"), str(scene / "output"),
                              str(scene / "flow_bwd"),
                              str(scene / "temporal"))
    names = sorted(p.name for p in (scene / "input").glob("*.png"))

    print("[demo] training PLAIN checkpoint ...", flush=True)
    ck_plain = train_ckpt(scene, out / "run_plain", args.steps,
                          temporal=False)
    print("[demo] training TEMPORAL checkpoint ...", flush=True)
    ck_temp = train_ckpt(scene, out / "run_temporal", args.steps,
                         temporal=True)
    print("[demo] training TEMPORAL+GUIDE-DROPOUT checkpoint ...", flush=True)
    ck_gd = train_ckpt(scene, out / "run_temporal_gd", args.steps,
                       temporal=True, gd_p=args.guide_dropout_p)

    print("[demo] stylizing ...", flush=True)
    stylize(scene, ck_plain, out / "stylized_plain", temporal=False)
    stylize(scene, ck_temp, out / "stylized_temporal", temporal=True)
    stylize(scene, ck_gd, out / "stylized_temporal_gd", temporal=True)
    # broken-chain serving: guide = frame RGB on every frame (the chain's
    # start condition, permanently) — measures over-reliance on the guide
    stylize(scene, ck_temp, out / "stylized_temporal_broken",
            temporal=True, broken_chain=True)
    stylize(scene, ck_gd, out / "stylized_temporal_gd_broken",
            temporal=True, broken_chain=True)

    results = {
        "input_floor": sequence_metrics(scene / "input_noisy", scene,
                                        names),
        "plain": sequence_metrics(out / "stylized_plain", scene, names),
        "temporal": sequence_metrics(out / "stylized_temporal", scene,
                                     names),
        "temporal_gd": sequence_metrics(out / "stylized_temporal_gd",
                                        scene, names),
        "temporal_broken": sequence_metrics(
            out / "stylized_temporal_broken", scene, names),
        "temporal_gd_broken": sequence_metrics(
            out / "stylized_temporal_gd_broken", scene, names),
        "steps": args.steps, "frames": args.frames,
        "noise_sigma": args.noise,
        "guide_dropout_p": args.guide_dropout_p,
        "wall_seconds": round(time.time() - t0, 1),
    }
    (out / "temporal_demo.json").write_text(json.dumps(results, indent=1))

    r = results
    red = (1 - r["temporal"]["flicker_mean_abs"]
           / max(r["plain"]["flicker_mean_abs"], 1e-9)) * 100
    lines = [
        "# Temporal-guide mode: measured flicker reduction",
        "",
        f"Synthetic moving-blob scene ({args.frames} frames "
        f"{args.height}x{args.width}); training and flows use the clean "
        f"frames, then per-frame sensor noise (sigma {args.noise}) is "
        "injected into the INPUTS AT SERVING TIME — the classic source of "
        "video flicker for a memoryless per-frame stylizer. Two "
        f"checkpoints trained {r['steps']} steps each with identical "
        "budgets (tools/temporal_demo.py): PLAIN (RGB input) vs TEMPORAL "
        "(RGB + 3 channels carrying the flow-warped previous stylized "
        "frame, chained through `inference.temporal.enabled`).",
        "",
        "Flicker = mean |out_i − warp(out_{i−1}, flow_i)| inside the mask "
        "(lower is stabler); warped PSNR is the same comparison as PSNR "
        "(higher is stabler); target PSNR checks stylization quality "
        "didn't regress.",
        "",
        "| sequence | flicker (mean abs, /255) | warped PSNR (dB) | "
        "target PSNR (dB) |",
        "|---|---|---|---|",
        f"| input (noise floor) | {r['input_floor']['flicker_mean_abs']} | "
        f"{r['input_floor']['warped_psnr_db']} | — |",
        f"| plain checkpoint | {r['plain']['flicker_mean_abs']} | "
        f"{r['plain']['warped_psnr_db']} | {r['plain']['target_psnr_db']} |",
        f"| temporal checkpoint | {r['temporal']['flicker_mean_abs']} | "
        f"{r['temporal']['warped_psnr_db']} | "
        f"{r['temporal']['target_psnr_db']} |",
        f"| temporal + guide-dropout p={r['guide_dropout_p']} | "
        f"{r['temporal_gd']['flicker_mean_abs']} | "
        f"{r['temporal_gd']['warped_psnr_db']} | "
        f"{r['temporal_gd']['target_psnr_db']} |",
        "",
        "Broken-chain serving (guide = frame RGB on EVERY frame — the "
        "chain permanently at its restart condition, "
        "`inference.temporal` without a `flow_dir`; "
        "PARITY_NOTES #20):",
        "",
        "| checkpoint | flicker | warped PSNR (dB) | target PSNR (dB) |",
        "|---|---|---|---|",
        f"| temporal (no dropout) | "
        f"{r['temporal_broken']['flicker_mean_abs']} | "
        f"{r['temporal_broken']['warped_psnr_db']} | "
        f"{r['temporal_broken']['target_psnr_db']} |",
        f"| temporal + guide-dropout | "
        f"{r['temporal_gd_broken']['flicker_mean_abs']} | "
        f"{r['temporal_gd_broken']['warped_psnr_db']} | "
        f"{r['temporal_gd_broken']['target_psnr_db']} |",
        "",
        f"**Temporal mode cuts flicker by {red:.0f}%** "
        f"({r['plain']['flicker_mean_abs']} → "
        f"{r['temporal']['flicker_mean_abs']}, warped PSNR "
        f"{r['plain']['warped_psnr_db']} → "
        f"{r['temporal']['warped_psnr_db']} dB). Raw frames in "
        "stylized_plain/ vs stylized_temporal/, scene in scene/.",
        "",
        "Guide-dropout reading: compare the two tables' deltas against "
        "the ~0.5 dB within-stack seed spread "
        "(docs/quality_seed_study) before crediting either checkpoint — "
        "on this synthetic scene the no-dropout checkpoint shows no "
        "catastrophic guide over-reliance to begin with, so the knob's "
        "value is insurance for streams with frequent chain restarts, "
        "not a quality win here. It ships off by default "
        "(`training.guide_dropout_p=0`, PARITY_NOTES #20).",
    ]
    (out / "REPORT.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines), flush=True)


if __name__ == "__main__":
    main()
