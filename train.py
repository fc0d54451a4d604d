#!/usr/bin/env python
"""Training driver — same CLI surface as the reference ``train.py``.

Usage:
    python train.py [key=value overrides ...]
e.g.
    python train.py training.batch_size=40 data.patch_size=64 data=miku

Composes the Hydra-compatible ``config/`` tree (reference train.py:51-52),
prints + snapshots the resolved config into the timestamped run directory
(reference train.py:56-64, config/config.yaml:12-18), builds the
StyleTransferModel and device-resident dataset, and runs the jitted training
loop with top-3+last checkpointing, TensorBoard logging, and early stopping
(reference train.py:15-49,89-105).
"""

from __future__ import annotations

import sys
from pathlib import Path


def _ensure_sample_data(cfg) -> None:
    """Make the default config runnable from a fresh clone.

    The reference vendors real sample sequences in-repo (test_dataset/,
    config/data/default.yaml:2-4 works immediately); this build generates an
    equivalent synthetic scene on first use instead of vendoring binaries.
    Only paths under a ``test_dataset`` directory are auto-generated — a
    missing user path still raises the dataset's clear error.
    """
    import time

    if isinstance(cfg.data.dir_pre, (list, tuple)):
        return  # explicit multi-sequence config: never auto-generate
    dir_pre = Path(cfg.data.dir_pre)
    scene = dir_pre.parent
    sentinel = scene / ".complete"
    if dir_pre.exists() and (sentinel.exists() or any(dir_pre.iterdir())):
        return
    if "test_dataset" not in scene.parts:
        return

    # multi-host: only process 0 generates; the rest wait for the sentinel
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        for _ in range(600):
            if sentinel.exists():
                return
            time.sleep(0.1)
        raise TimeoutError(f"waited for process 0 to generate {scene}")

    print(f"Sample scene {scene} not found — generating a synthetic one "
          f"(tools/make_sample_scene.py)")
    sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
    from make_sample_scene import make_scene

    make_scene(str(scene), frames=7)
    sentinel.touch()


def train(cfg) -> None:
    import jax

    from patch_toon_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    accelerator = str(cfg.training.get("accelerator", "auto"))
    if accelerator == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # Multi-host (DCN): the cluster MUST be joined before ANY jax call that
    # initializes the backend (the dataset device_puts keyframes to HBM).
    par = cfg.get("parallel", {}) or {}
    dcn_cfg = par.get("dcn", {}) or {}
    dcn_enabled = bool(dcn_cfg.get("enabled", False))
    if dcn_enabled:
        from patch_toon_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=dcn_cfg.get("coordinator_address"),
            num_processes=dcn_cfg.get("num_processes"),
            process_id=dcn_cfg.get("process_id"),
        )

    import yaml

    from patch_toon_tpu.config import save, to_container
    from patch_toon_tpu.data import StyleTransferDataset
    from patch_toon_tpu.parallel import make_mesh
    from patch_toon_tpu.train.loop import fit
    from patch_toon_tpu.train.model import StyleTransferModel

    run_dir = Path(cfg.get("run", {}).get("dir")
                   or cfg.training.get("output_dir", "outputs"))
    run_dir.mkdir(parents=True, exist_ok=True)
    print("=== Resolved config ===")
    print(yaml.safe_dump(to_container(cfg), sort_keys=False))
    save(cfg, run_dir / "config.yaml")  # snapshot (reference train.py:62-64)

    _ensure_sample_data(cfg)
    dataset = StyleTransferDataset(
        dir_pre=cfg.data.dir_pre,
        dir_post=cfg.data.dir_post,
        dir_mask=cfg.data.dir_mask,
        patch_size=int(cfg.data.patch_size),
        augmentation_factor=int(cfg.data.get("augmentation_factor", 1)),
        additional_channels=to_container(
            cfg.data.get("additional_channels") or {}),
        sampling=str(cfg.data.get("sampling", "uniform")),
    )

    model = StyleTransferModel(
        generator_config=cfg.model.generator,
        discriminator_config=cfg.model.get("discriminator"),
        training_config=cfg.training,
        optimizer_config=cfg.optimizer,
        data_config=cfg.data,
        perception_loss_config=cfg.model.get("perception_loss"),
    )

    # devices: 1 = single chip (no mesh), N = N-chip data mesh, -1 = all chips
    devices = int(cfg.training.get("devices", 1))
    mesh = None
    if dcn_enabled:
        # multi-slice ('dcn','data','model') hybrid mesh: ICI inside
        # slices, DCN between (cluster already joined above)
        from patch_toon_tpu.parallel import make_dcn_mesh

        mesh_cfg = par.get("mesh", {}) or {}
        mesh = make_dcn_mesh(
            data=devices if devices != 1 else -1,
            model=int(mesh_cfg.get("model", 1)),
            dcn=int(dcn_cfg.get("slices", -1)),
        )
        print(f"DCN mesh ({jax.process_count()} processes): {mesh}")
    elif devices != 1:
        mesh_cfg = par.get("mesh", {}) or {}
        mesh = make_mesh(data=devices, model=int(mesh_cfg.get("model", 1)))
        print(f"Mesh: {mesh}")

    fit(model, dataset, run_dir=str(run_dir), mesh=mesh,
        max_epochs=int(cfg.training.get("max_epochs", 50)),
        resume_from=cfg.training.get("resume_from"),
        seed=int(cfg.training.get("seed", 0)))
    print(f"Training complete. Run dir: {run_dir}")


def _expand_multirun(overrides):
    """Hydra-style ``-m``/``--multirun`` sweeps: comma-separated values
    expand into the cartesian product of runs (config/config.yaml sweep
    surface parity)."""
    import itertools

    keys, value_lists, fixed = [], [], []
    for ov in overrides:
        if "=" in ov and "," in ov.split("=", 1)[1]:
            k, v = ov.split("=", 1)
            keys.append(k)
            value_lists.append(v.split(","))
        else:
            fixed.append(ov)
    for combo in itertools.product(*value_lists):
        yield fixed + [f"{k}={v}" for k, v in zip(keys, combo)]


def main(argv=None) -> None:
    from patch_toon_tpu.config import compose

    argv = sys.argv[1:] if argv is None else argv
    config_dir = Path(__file__).resolve().parent / "config"

    multirun = False
    if "-m" in argv or "--multirun" in argv:
        multirun = True
        argv = [a for a in argv if a not in ("-m", "--multirun")]

    if multirun:
        for i, run_overrides in enumerate(_expand_multirun(argv)):
            print(f"\n===== multirun job {i}: {run_overrides} =====")
            cfg = compose(config_dir, "config", overrides=run_overrides)
            cfg.run.dir = str(Path(cfg.run.dir) / f"job_{i}")
            train(cfg)
    else:
        cfg = compose(config_dir, "config", overrides=argv)
        train(cfg)


if __name__ == "__main__":
    main()
