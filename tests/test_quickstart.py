"""Fresh-clone quickstart: `python train.py` must work with no data present.

The reference vendors sample sequences in-repo so its default config runs
immediately (config/data/default.yaml:2-4); this build synthesizes an
equivalent scene on first use (train.py::_ensure_sample_data).
"""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_sample_generation_skips_multi_sequence_configs(tmp_path, monkeypatch):
    """Multi-sequence (list) data dirs must never trigger auto-generation
    (regression: Path(list) raised TypeError)."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, str(REPO))
    import train as train_mod
    from patch_toon_tpu.config import compose

    cfg = compose(REPO / "config", "config", overrides=[
        "data.dir_pre=[a/input,b/input]",
        "data.dir_post=[a/output,b/output]",
        "data.dir_mask=[a/mask,b/mask]",
    ])
    train_mod._ensure_sample_data(cfg)  # must no-op, not raise
    assert not (tmp_path / "test_dataset").exists()


def test_default_config_trains_from_empty_cwd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # no test_dataset/ here — must be generated
    sys.path.insert(0, str(REPO))
    import train as train_mod

    train_mod.main([
        "training.max_epochs=1",
        "training.max_steps=2",
        "training.batch_size=4",
        "data.patch_size=32",
        "training.accelerator=cpu",
        "training.log_every_n_steps=1",
        "training.image_log_freq=1000000",
        f"training.output_dir={tmp_path / 'out'}",
        f"run.dir={tmp_path / 'out' / 'run'}",
    ])

    scene = tmp_path / "test_dataset" / "PlatinumChan_x0.5_train"
    for sub in ("input", "output", "mask", "tracking"):
        assert (scene / sub).exists() and any((scene / sub).iterdir())
    ckpts = tmp_path / "out" / "run" / "checkpoints"
    assert (ckpts / "last").exists()
    assert (ckpts / "epoch_0000").exists()
    assert (tmp_path / "out" / "run" / "config.yaml").exists()

    # resume continues epoch numbering (no overwrite of pre-resume epochs):
    # max_epochs is the TOTAL target, so 2 trains exactly one more epoch;
    # max_steps is a GLOBAL cap (lightning semantics) — the resumed run
    # starts at step 2, so 4 allows 2 more steps for epoch 1
    train_mod.main([
        "training.max_epochs=2",
        "training.max_steps=4",
        "training.batch_size=4",
        "data.patch_size=32",
        "training.accelerator=cpu",
        "training.log_every_n_steps=1",
        "training.image_log_freq=1000000",
        f"training.resume_from={ckpts / 'last'}",
        f"training.output_dir={tmp_path / 'out'}",
        f"run.dir={tmp_path / 'out' / 'run'}",
    ])
    assert (ckpts / "epoch_0000").exists()
    assert (ckpts / "epoch_0001").exists()
