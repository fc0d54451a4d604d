#!/usr/bin/env python
"""Multi-style batched training demo: N styles, ONE training run, N usable
stylizations.

VERDICT r2 #5: the dataset's multi-sequence support (data/dataset.py —
dir_pre/dir_post/dir_mask as lists, the capability half of BASELINE.json
config #5) is unit-tested but was never demonstrated end-to-end. This tool:

  1. generates 3 synthetic scenes (different content seeds) and gives each
     a DIFFERENT hand-stylization of its input frames:
       style A: posterize + warm tint (make_sample_scene's default)
       style B: color inversion
       style C: grayscale + posterize + cool tint
  2. trains ONE model jointly on all three via the real train.py config
     path (list-valued data.dir_pre/dir_post/dir_mask overrides);
  3. stylizes every scene back with the ONE joint checkpoint through the
     real tiled engine and scores masked PSNR vs each scene's own target
     AND vs the other styles' renderings of the same content (the joint
     model must reproduce style A for scene A, not an average style);
  4. writes docs/multistyle/REPORT.md with the matrix + a README recipe.

Run:  python tools/multistyle_demo.py [--steps 600] [--out docs/multistyle]
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


def restyle(scene: Path, style: str) -> None:
    """Overwrite scene/output with a distinct deterministic stylization."""
    for p in sorted((scene / "input").glob("*.png")):
        x = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        if style == "invert":
            y = 1.0 - x
        elif style == "gray_cool":
            g = x.mean(axis=-1, keepdims=True)
            y = np.round(g * 5) / 5 * np.array([0.75, 0.9, 1.2], np.float32)
        else:
            raise ValueError(style)
        Image.fromarray(
            (np.clip(y, 0, 1) * 255).astype(np.uint8)
        ).save(scene / "output" / p.name)


def masked_psnr(a: Path, b: Path, mask: Path) -> float:
    x = np.asarray(Image.open(a).convert("RGB"), np.float64)
    y = np.asarray(Image.open(b).convert("RGB"), np.float64)
    m = np.asarray(Image.open(mask), np.float32) > 127
    mse = ((x - y) ** 2)[m].mean()
    return float(10 * np.log10(255.0 ** 2 / max(mse, 1e-9)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--out", default=str(REPO / "docs" / "multistyle"))
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from make_sample_scene import make_scene

    import train as train_entry
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer.engine import StyleTransferInference

    styles = [("warm_posterize", None), ("invert", "invert"),
              ("gray_cool", "gray_cool")]
    scenes = []
    for i, (name, restyle_key) in enumerate(styles):
        scene = out / f"scene_{name}"
        if not (scene / "input").exists():
            make_scene(str(scene), frames=args.frames, height=96, width=128,
                       seed=10 + i)
            if restyle_key:
                restyle(scene, restyle_key)
        scenes.append(scene)

    # ---- one joint training run over all three scenes -------------------
    run_dir = out / "run_joint"
    ckpt = run_dir / "checkpoints" / "last"
    if not ckpt.exists():
        t0 = time.time()
        lp = ",".join(str(s / "input") for s in scenes)
        lo = ",".join(str(s / "output") for s in scenes)
        lm = ",".join(str(s / "mask") for s in scenes)
        lt = ",".join(str(s / "tracking") for s in scenes)
        cfg = compose(REPO / "config", "config", overrides=[
            f"data.dir_pre=[{lp}]",
            f"data.dir_post=[{lo}]",
            f"data.dir_mask=[{lm}]",
            "data.patch_size=32",
            "data.additional_channels="
            f"{{point_vector: {{path: [{lt}], depth: 3}}}}",
            "training.batch_size=48",
            "training.max_epochs=1000000",
            f"training.max_steps={args.steps}",
            "training.early_stopping=false",
            "training.image_log_freq=1000000",
            "training.log_every_n_steps=200",
            f"training.output_dir={run_dir}/out",
            f"run.dir={run_dir}",
            "model.generator.args.resnet_blocks=3",
            "model.generator.args.filters=[16,32,64,64,64,32]",
            "model.discriminator.args.num_filters=8",
        ])
        train_entry.train(cfg)
        print(f"[multistyle] joint training: {time.time() - t0:.0f}s",
              flush=True)

    # ---- stylize every scene back with the ONE checkpoint ---------------
    for scene in scenes:
        sdir = out / f"stylized_{scene.name.split('scene_', 1)[1]}"
        cfg = compose(REPO / "config", "inference", overrides=[
            f"paths.checkpoint={ckpt}",
            f"paths.input_dir={scene}/input",
            f"paths.mask_dir={scene}/mask",
            f"paths.output_dir={sdir}",
            "paths.additional_channels="
            f"{{point_vector: {{path: {scene}/tracking, depth: 3}}}}",
            "data.patch_size=32",
            "inference.precision=32",
        ])
        StyleTransferInference(cfg).process_directory(progress=False)

    # ---- score: own-target vs cross-style targets -----------------------
    # cross-style reference: what scene i's input would look like under
    # style j (re-render with the deterministic stylizers)
    matrix = {}
    for i, (sname, _) in enumerate(styles):
        scene = scenes[i]
        sdir = out / f"stylized_{sname}"
        names = sorted(p.name for p in (scene / "input").glob("*.png"))
        row = {}
        for j, (tname, restyle_key) in enumerate(styles):
            # build style-j rendering of scene i's content on the fly
            tdir = out / f"xref_{sname}_as_{tname}"
            if not tdir.exists():
                tdir.mkdir()
                from make_sample_scene import _stylize

                for n in names:
                    x = np.asarray(Image.open(scene / "input" / n)
                                   .convert("RGB"), np.float32) / 255.0
                    if restyle_key == "invert":
                        y = 1.0 - x
                    elif restyle_key == "gray_cool":
                        g = x.mean(axis=-1, keepdims=True)
                        y = np.round(g * 5) / 5 * np.array(
                            [0.75, 0.9, 1.2], np.float32)
                    else:
                        y = _stylize(x)
                    Image.fromarray((np.clip(y, 0, 1) * 255).astype(
                        np.uint8)).save(tdir / n)
            vals = [masked_psnr(sdir / n, tdir / n, scene / "mask" / n)
                    for n in names]
            row[tname] = round(float(np.mean(vals)), 2)
        matrix[sname] = row
        print(f"[multistyle] {sname}: {row}", flush=True)

    ok = all(matrix[s][s] == max(row.values())
             for s, row in matrix.items())
    payload = {"steps": args.steps, "matrix": matrix,
               "own_style_wins_every_row": ok}
    (out / "multistyle.json").write_text(json.dumps(payload, indent=1))

    lines = [
        "# Multi-style batched training: one run, three styles",
        "",
        f"One model trained {args.steps} steps jointly on three synthetic "
        "scenes with three different hand-stylizations (list-valued "
        "`data.dir_pre/dir_post/dir_mask` — the multi-sequence dataset, "
        "no reference equivalent), then each scene stylized back with the "
        "single joint checkpoint (tools/multistyle_demo.py).",
        "",
        "Masked PSNR of each stylization against each STYLE's rendering "
        "of that scene's content — the diagonal (own style) must win its "
        "row, i.e. the joint model reproduces each scene's own style, not "
        "an average:",
        "",
        "| stylized scene \\ style ref | " +
        " | ".join(s for s, _ in styles) + " |",
        "|---|" + "---|" * len(styles),
    ]
    for sname, _ in styles:
        row = matrix[sname]
        cells = []
        for tname, _ in styles:
            v = f"{row[tname]}"
            cells.append(f"**{v}**" if tname == sname else v)
        lines.append(f"| {sname} | " + " | ".join(cells) + " |")
    lines += [
        "",
        f"Own style wins every row: **{ok}**.",
        "",
        "## Recipe",
        "",
        "```bash",
        "python train.py \\",
        "  'data.dir_pre=[sceneA/input,sceneB/input,sceneC/input]' \\",
        "  'data.dir_post=[sceneA/output,sceneB/output,sceneC/output]' \\",
        "  'data.dir_mask=[sceneA/mask,sceneB/mask,sceneC/mask]' \\",
        "  'data.additional_channels={point_vector: {path: "
        "[sceneA/tracking,sceneB/tracking,sceneC/tracking], depth: 3}}'",
        "```",
        "",
        "Per-channel paths may be parallel lists; sampling draws uniformly "
        "over scenes then patches, exactly like the single-scene path.",
    ]
    (out / "REPORT.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines), flush=True)


if __name__ == "__main__":
    main()
