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

    # Broken-chain serving (temporal WITHOUT flow_dir): the guide is the
    # frame's own RGB on EVERY frame (engine temporal path, chain start
    # condition) — must be byte-identical to serving with static guide
    # channels read from the input dir itself.
    def _styl(out_dir, extra):
        c = compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={ckpt}",
            f"paths.input_dir={base}/input",
            f"paths.mask_dir={base}/mask",
            f"paths.output_dir={out_dir}",
            "data.patch_size=16",
            "inference.use_gpu=false",
            "inference.precision=32",
            "model.generator.args.resnet_blocks=1",
            "model.generator.args.filters=[4,8,8,8,8,4]",
        ] + extra)
        StyleTransferInference(c).process_directory()

    _styl(tmp_path / "broken", ["paths.additional_channels={}",
                                "+inference.temporal.enabled=true",
                                "+inference.temporal.depth=3"])
    _styl(tmp_path / "static_rgb", [
        f"paths.additional_channels={{temporal: {{path: {base}/input, depth: 3}}}}"])
    for name in sorted(p.name for p in (tmp_path / "broken").glob("*.png")):
        a = np.asarray(Image.open(tmp_path / "broken" / name))
        b = np.asarray(Image.open(tmp_path / "static_rgb" / name))
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_temporal_watch_chain_persists(temporal_scene, tmp_path):
    """Watch mode with the temporal guide: frames arriving across polls
    must produce the same chained outputs as a one-shot run (the warp
    chain and global flow index persist on the engine between polls)."""
    import shutil
    import threading
    import time

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference
    from patch_toon_tpu.train import StyleTransferModel
    from patch_toon_tpu.train.checkpoints import CheckpointManager

    base = temporal_scene
    g_args = dict(input_channels=6, use_bias=True, tanh=True,
                  append_smoothers=True, resnet_blocks=1,
                  filters=[4, 8, 8, 8, 8, 4], norm_layer="instance_norm")
    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(g_args)},
        discriminator_config=None,
        training_config=dict(batch_size=4, precision=32),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5)),
        data_config=dict(patch_size=16, additional_channels={}),
        perception_loss_config=None,
    )
    state = model.init_state(jax.random.PRNGKey(0), patch_size=16)
    CheckpointManager(
        tmp_path / "ckpt",
        meta={"input_channels": 6, "generator_args": g_args,
              "patch_size": 16},
    ).save(state, epoch=0, score=1.0)

    root = pathlib.Path(__file__).resolve().parents[1]

    def make_cfg(in_dir, mask_dir, out_dir, extra=()):
        return compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={tmp_path}/ckpt/last",
            f"paths.input_dir={in_dir}",
            f"paths.mask_dir={mask_dir}",
            f"paths.output_dir={out_dir}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            "inference.precision=32",
            "+inference.temporal.enabled=true",
            f"+inference.temporal.flow_dir={base}/flow_bwd",
            "+inference.temporal.depth=3",
            *extra,
        ])

    # one-shot reference over all 5 frames
    StyleTransferInference(make_cfg(
        base / "input", base / "mask", tmp_path / "ref")).process_directory()

    # watch run: 3 frames now, 2 arrive while the service runs
    win = tmp_path / "win"
    wmask = tmp_path / "wmask"
    win.mkdir()
    wmask.mkdir()
    for i in range(3):
        shutil.copy(base / "input" / f"{i:03d}.png", win)
        shutil.copy(base / "mask" / f"{i:03d}.jpg", wmask)
    eng = StyleTransferInference(make_cfg(
        win, wmask, tmp_path / "wout", extra=[
            "inference.watch.enabled=true",
            "inference.watch.poll_seconds=0.3",
            "inference.watch.idle_timeout_seconds=40",
        ]))
    t = threading.Thread(target=eng.watch_directory)
    t.start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline and not (
                tmp_path / "wout" / "002.png").exists():
            time.sleep(0.5)
        assert (tmp_path / "wout" / "002.png").exists()
        for i in (3, 4):
            shutil.copy(base / "input" / f"{i:03d}.png", win)
            shutil.copy(base / "mask" / f"{i:03d}.jpg", wmask)
        deadline = time.time() + 60
        while time.time() < deadline and not (
                tmp_path / "wout" / "004.png").exists():
            time.sleep(0.5)
        assert (tmp_path / "wout" / "004.png").exists()
    finally:
        t.join(timeout=120)
    assert not t.is_alive()

    # chained outputs identical to the one-shot run — including frames 3-4,
    # whose guides depend on the chain state carried across the poll gap
    for i in range(5):
        a = np.asarray(Image.open(tmp_path / "wout" / f"{i:03d}.png"))
        b = np.asarray(Image.open(tmp_path / "ref" / f"{i:03d}.png"))
        np.testing.assert_array_equal(a, b, err_msg=f"{i:03d}.png")
