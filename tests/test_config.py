"""Config composition tests (parity with the reference Hydra surface)."""

import pathlib

import pytest

from patch_toon_tpu.config import compose, save, load_yaml, to_container

CONFIG_DIR = pathlib.Path(__file__).resolve().parents[1] / "config"


def test_compose_training_defaults():
    cfg = compose(CONFIG_DIR, "config")
    assert cfg.training.batch_size == 80
    assert cfg.data.patch_size == 80
    assert cfg.model.generator.args.input_channels == "auto"
    assert cfg.model.generator.args.filters == [32, 64, 128, 128, 128, 64]
    assert cfg.optimizer.generator.lr == pytest.approx(4e-4)
    assert cfg.model.perception_loss.weight == 6.0
    # reference config/data/default.yaml:6-9 additional channel schema
    assert cfg.data.additional_channels.point_vector.depth == 3


def test_compose_inference_interpolation():
    cfg = compose(CONFIG_DIR, "inference")
    # ${paths.input_dir} interpolation, reference config/inference.yaml:33
    assert cfg.data.dir_pre == cfg.paths.input_dir
    assert cfg.data.dir_post is None
    assert cfg.inference.debug_mode is False
    assert cfg.paths.additional_channels.point_vector.depth == 3


def test_value_overrides():
    cfg = compose(
        CONFIG_DIR,
        "config",
        overrides=[
            "training.batch_size=16",
            "data.patch_size=32",
            "+training.new_knob=7",
            "model.generator.args.resnet_blocks=3",
        ],
    )
    assert cfg.training.batch_size == 16
    assert cfg.data.patch_size == 32
    assert cfg.training.new_knob == 7
    assert cfg.model.generator.args.resnet_blocks == 3


def test_now_resolver():
    cfg = compose(CONFIG_DIR, "config")
    assert len(cfg.run.dir.split("/")) >= 3  # outputs/DATE/TIME


def test_save_roundtrip(tmp_path):
    cfg = compose(CONFIG_DIR, "config")
    out = tmp_path / "cfg.yaml"
    save(cfg, out)
    again = load_yaml(out)
    assert to_container(again)["training"]["batch_size"] == 80


def test_group_selection_override(tmp_path):
    # build a second data group file, select it via `data=alt`
    alt = CONFIG_DIR / "data" / "_test_alt.yaml"
    alt.write_text("dir_pre: /x\ndir_post: /y\ndir_mask: /z\npatch_size: 16\n"
                   "additional_channels: {}\naugmentation_factor: 1\n")
    try:
        cfg = compose(CONFIG_DIR, "config", overrides=["data=_test_alt"])
        assert cfg.data.patch_size == 16
        assert cfg.data.dir_pre == "/x"
    finally:
        alt.unlink()
