"""Temporal-guide tests: warp op, guide tool, and end-to-end chaining."""

import pathlib
import sys

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

TOOLS = pathlib.Path(__file__).resolve().parents[1] / "tools"
if str(TOOLS) not in sys.path:
    sys.path.insert(0, str(TOOLS))


def test_warp_image_translation():
    from patch_toon_tpu.ops.flow import warp_image

    rng = np.random.default_rng(0)
    img = rng.random((20, 30, 3)).astype(np.float32)
    flow = np.zeros((20, 30, 2), np.float32)
    flow[..., 0] = 3.0  # sample 3 px to the right
    got = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got[:, :-3], img[:, 3:], atol=1e-6)


@pytest.fixture()
def temporal_scene(tmp_path):
    """5-frame scene with flows, stylized outputs, masks."""
    from optical_flow import OpticalFlowCalculator

    rng = np.random.default_rng(3)
    for sub in ("input", "output", "mask", "temporal"):
        (tmp_path / sub).mkdir()
    bg = (rng.random((48, 64, 3)) * 160).astype(np.uint8)
    for i in range(5):
        frame = bg.copy()
        x0 = 6 + 5 * i
        frame[16:32, x0:x0 + 14] = (rng.random(3) * 100 + 155).astype(np.uint8)
        Image.fromarray(frame).save(tmp_path / "input" / f"{i:03d}.png")
        Image.fromarray(255 - frame).save(tmp_path / "output" / f"{i:03d}.png")
        mask = np.full((48, 64), 255, np.uint8)
        Image.fromarray(mask).save(tmp_path / "mask" / f"{i:03d}.jpg")

    OpticalFlowCalculator(
        tmp_path / "input", tmp_path / "flow_fwd", tmp_path / "flow_bwd",
        tmp_path / "mask", backend="tpu").calculate_flows()
    return tmp_path


def test_temporal_guide_tool(temporal_scene):
    from temporal_guide import build_temporal_guides

    n = build_temporal_guides(
        str(temporal_scene / "input"), str(temporal_scene / "output"),
        str(temporal_scene / "flow_bwd"), str(temporal_scene / "temporal"))
    assert n == 5
    guides = sorted((temporal_scene / "temporal").glob("*.png"))
    assert len(guides) == 5
    g0 = np.asarray(Image.open(guides[0]))
    in0 = np.asarray(Image.open(temporal_scene / "input" / "000.png"))
    np.testing.assert_array_equal(g0, in0)  # frame-0 bootstrap = input
    g1 = np.asarray(Image.open(guides[1]))
    out0 = np.asarray(Image.open(temporal_scene / "output" / "000.png"))
    assert not np.array_equal(g1, out0)  # warped, not copied


def test_temporal_end_to_end(temporal_scene, tmp_path):
    """Train with temporal channels, then chain real outputs at inference."""
    from temporal_guide import build_temporal_guides

    import train as train_entry
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    build_temporal_guides(
        str(temporal_scene / "input"), str(temporal_scene / "output"),
        str(temporal_scene / "flow_bwd"), str(temporal_scene / "temporal"))

    root = pathlib.Path(__file__).resolve().parents[1]
    run_dir = tmp_path / "run"
    base = temporal_scene
    cfg = compose(root / "config", "config", overrides=[
        f"data.dir_pre={base}/input",
        f"data.dir_post={base}/output",
        f"data.dir_mask={base}/mask",
        "data.patch_size=16",
        f"data.additional_channels={{temporal: {{path: {base}/temporal, depth: 3}}}}",
        "training.batch_size=32",
        "training.max_epochs=1",
        "training.early_stopping=false",
        "training.image_log_freq=1000",
        f"training.output_dir={tmp_path}/out",
        f"run.dir={run_dir}",
        "model.generator.args.resnet_blocks=1",
        "model.generator.args.filters=[4,8,8,8,8,4]",
        "model.discriminator.args.num_filters=4",
    ])
    train_entry.train(cfg)
    ckpt = run_dir / "checkpoints" / "last"
    assert ckpt.exists()

    icfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={base}/input",
        f"paths.mask_dir={base}/mask",
        f"paths.output_dir={base}/stylized",
        "paths.additional_channels={}",
        "data.patch_size=16",
        "inference.use_gpu=false",
        "inference.precision=32",
        "+inference.temporal.enabled=true",
        f"+inference.temporal.flow_dir={base}/flow_bwd",
        "+inference.temporal.depth=3",
        "model.generator.args.resnet_blocks=1",
        "model.generator.args.filters=[4,8,8,8,8,4]",
    ])
    eng = StyleTransferInference(icfg)
    assert eng.total_channels == 6
    eng.process_directory()
    outs = sorted((base / "stylized").glob("*.png"))
    assert len(outs) == 5
    arr = np.asarray(Image.open(outs[2]))
    assert arr.shape == (48, 64, 3)
    assert arr.std() > 1.0
