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


def test_temporal_prep_fused_matches_eager():
    """The single-dispatch _temporal_prep must equal the op-by-op
    composition it fused (normalize + warp + slice + concat) for all
    three static variants (warp / bootstrap / hold), exactly."""
    from patch_toon_tpu.infer.engine import _temporal_prep, _to_signed_unit
    from patch_toon_tpu.ops.flow import warp_image

    rng = np.random.default_rng(7)
    frame_u8 = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    prev = jnp.asarray(rng.random((24, 32, 3)).astype(np.float32) * 2 - 1)
    flow = jnp.asarray((rng.random((24, 32, 2)).astype(np.float32) - 0.5) * 6)

    fdev = _to_signed_unit(jnp.asarray(frame_u8))
    # warp variant: XLA's fusion inside the single program contracts the
    # interpolation arithmetic (FMA) — 1-ulp tolerance vs the eager ops
    got = _temporal_prep(jnp.asarray(frame_u8), prev, flow, 3)
    want = jnp.concatenate([fdev, warp_image(prev, flow)], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-7)
    # bootstrap (chain start): guide = own RGB (the in-jit normalization
    # also contracts to FMA — same 1-ulp bound, and a value k/255*2-1
    # re-quantizes to exactly k so uint8 outputs can never flip)
    got0 = _temporal_prep(jnp.asarray(frame_u8), None, None, 3)
    np.testing.assert_allclose(
        np.asarray(got0), np.asarray(jnp.concatenate([fdev, fdev], axis=-1)),
        atol=2e-7)
    # hold (missing flow): guide = previous output unwarped, bit-exact
    goth = _temporal_prep(jnp.asarray(frame_u8), prev, None, 3)
    np.testing.assert_array_equal(
        np.asarray(goth)[..., 3:], np.asarray(prev))
    np.testing.assert_allclose(
        np.asarray(goth)[..., :3], np.asarray(fdev), atol=2e-7)
    # fp32 frames (strict-precision path) pass through unnormalized
    f32 = np.asarray(fdev)
    np.testing.assert_allclose(
        np.asarray(_temporal_prep(jnp.asarray(f32), prev, flow, 3)),
        np.asarray(want), atol=2e-7)


def test_temporal_prep_f16_flow_close():
    """float16 flow upload: warp coordinates quantize at ~2^-10 relative —
    the prep output must stay within a tight tolerance of the fp32-flow
    result (warp math itself is fp32 on device)."""
    from patch_toon_tpu.infer.engine import _temporal_prep

    rng = np.random.default_rng(11)
    frame = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    prev = jnp.asarray(rng.random((24, 32, 3)).astype(np.float32) * 2 - 1)
    flow32 = (rng.random((24, 32, 2)).astype(np.float32) - 0.5) * 8
    a = np.asarray(_temporal_prep(jnp.asarray(frame), prev,
                                  jnp.asarray(flow32), 3))
    b = np.asarray(_temporal_prep(jnp.asarray(frame), prev,
                                  jnp.asarray(flow32.astype(np.float16)), 3))
    # guide channels: bounded by max-gradient(2 per px) * coord quantization
    assert np.abs(a - b).max() < 0.05
    assert np.abs(a - b).mean() < 1e-3
    np.testing.assert_array_equal(a[..., :3], b[..., :3])  # RGB untouched


def test_temporal_flow_upload_knob_validation():
    """Unknown flow_upload values must raise, consistent with the other
    strict inference knobs (upload, crop_readback)."""
    import pathlib

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = compose(root / "config", "inference", overrides=[
        "+inference.temporal.flow_upload=fast",
    ])
    with pytest.raises(ValueError, match="flow_upload"):
        StyleTransferInference(cfg)


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


def test_pil_gray_bit_exact():
    """ops.flow.pil_gray must reproduce PIL convert('L') bytes exactly —
    uint8 input AND the engine's normalized-f32 representation."""
    from patch_toon_tpu.ops.flow import pil_gray

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (41, 67, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(img).convert("L"))
    np.testing.assert_array_equal(np.asarray(pil_gray(jnp.asarray(img))),
                                  want)
    f32 = img.astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_array_equal(np.asarray(pil_gray(jnp.asarray(f32))),
                                  want)


def test_device_flow_matches_tool_npy(temporal_scene):
    """_temporal_device_flow must reproduce the flow the tpu-backend tool
    writes to flow_bwd/*.npy from the same frames (to float roundoff —
    the tool's call is eager, the engine's is fused into one program)."""
    from patch_toon_tpu.infer.engine import _temporal_device_flow

    base = temporal_scene
    i = 2
    f_cur = np.asarray(Image.open(base / "input" / f"{i:03d}.png"))
    f_prev = np.asarray(Image.open(base / "input" / f"{i - 1:03d}.png"))
    gray_prev = np.asarray(Image.fromarray(f_prev).convert("L"))
    mask = (np.asarray(
        Image.open(base / "mask" / f"{i:03d}.jpg").convert("L"))
        > 127).astype(np.uint8)
    flow, gray = _temporal_device_flow(
        jnp.asarray(f_cur), jnp.asarray(gray_prev), jnp.asarray(mask))
    want = np.load(base / "flow_bwd" / f"{i:03d}.npy")
    np.testing.assert_allclose(np.asarray(flow), want, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(gray),
        np.asarray(Image.fromarray(f_cur).convert("L")))


def test_device_flow_scale():
    """flow_scale=2 recovers a rigid translation about as well as full-res
    flow (upsampled displacements), and scale=1 stays bit-identical to the
    masked_flow path it refactored."""
    from patch_toon_tpu.infer.engine import _temporal_device_flow
    from patch_toon_tpu.ops.flow import masked_flow, pil_gray

    rng = np.random.default_rng(4)
    base = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    shifted = np.roll(base, -3, axis=1)  # scene moves 3 px left -> dx=+3?
    fmask = jnp.asarray(np.ones((64, 96), np.uint8))
    f1, gray1 = _temporal_device_flow(
        jnp.asarray(shifted), pil_gray(jnp.asarray(base)), fmask, 1)
    # scale=1 == the tool's masked_flow on the same grays (float roundoff:
    # eager call vs fused-in-jit fusion context)
    want = masked_flow(
        pil_gray(jnp.asarray(shifted)).astype(jnp.float32) / 255.0,
        pil_gray(jnp.asarray(base)).astype(jnp.float32) / 255.0, fmask)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(want), atol=1e-4)
    f2, _ = _temporal_device_flow(
        jnp.asarray(shifted), pil_gray(jnp.asarray(base)), fmask, 2)
    # both should recover ~3 px horizontal motion in the interior
    a = np.asarray(f1)[16:-16, 16:-16]
    b = np.asarray(f2)[16:-16, 16:-16]
    assert abs(float(np.median(a[..., 0])) - 3.0) < 1.0
    assert abs(float(np.median(b[..., 0])) - 3.0) < 1.5
    assert f2.shape == f1.shape


def test_temporal_device_flow_e2e(temporal_scene, tmp_path):
    """flow_source=device serves the same chain as flow_source=files when
    the .npy files came from the tpu backend — outputs within the float-
    roundoff envelope (the flow computations differ only in fusion
    context), using a random-weight temporal checkpoint."""
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

    def run(out_dir, extra):
        cfg = compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={tmp_path}/ckpt/last",
            f"paths.input_dir={base}/input",
            f"paths.mask_dir={base}/mask",
            f"paths.output_dir={out_dir}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            "+inference.temporal.enabled=true",
            "+inference.temporal.depth=3",
        ] + extra)
        StyleTransferInference(cfg).process_directory()

    run(tmp_path / "files", [f"+inference.temporal.flow_dir={base}/flow_bwd",
                             "+inference.temporal.flow_upload=f32"])
    run(tmp_path / "device", ["+inference.temporal.flow_source=device"])
    outs = sorted((tmp_path / "device").glob("*.png"))
    assert len(outs) == 5
    for p in outs:
        a = np.asarray(Image.open(p), np.int16)
        b = np.asarray(Image.open(tmp_path / "files" / p.name), np.int16)
        # identical math, different fusion contexts: allow +-1 count
        assert np.abs(a - b).max() <= 1, p.name


def test_temporal_device_flow_chain_persists_across_calls(temporal_scene,
                                                          tmp_path):
    """flow_source=device across split process_directory calls (the watch
    service's pattern): the chain state — previous stylized output AND
    previous frame's grayscale — must persist on the engine, giving
    byte-identical outputs to a one-shot run over all frames."""
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

    def make_engine(out_dir):
        return StyleTransferInference(compose(
            root / "config", "inference", overrides=[
                f"paths.checkpoint={tmp_path}/ckpt/last",
                f"paths.input_dir={base}/input",
                f"paths.mask_dir={base}/mask",
                f"paths.output_dir={out_dir}",
                "paths.additional_channels={}",
                "data.patch_size=16", "inference.use_gpu=false",
                "+inference.temporal.enabled=true",
                "+inference.temporal.flow_source=device",
                "+inference.temporal.depth=3",
            ]))

    make_engine(tmp_path / "oneshot").process_directory()
    files = sorted((base / "input").glob("*.png"))
    eng = make_engine(tmp_path / "split")
    eng.process_directory(files=files[:3], progress=False)
    eng.process_directory(files=files[3:], progress=False)
    for i in range(5):
        a = np.asarray(Image.open(tmp_path / "split" / f"{i:03d}.png"))
        b = np.asarray(Image.open(tmp_path / "oneshot" / f"{i:03d}.png"))
        np.testing.assert_array_equal(a, b, err_msg=f"{i:03d}.png")


def test_temporal_fullframe_mode(temporal_scene, tmp_path):
    """inference.mode=fullframe composes with the temporal chain: the
    serving loop's outputs are byte-identical to driving the engine's
    ``_chain_step`` directly (prep -> fullframe program -> carry), and the
    chain's guide channels actually feed the generator (frame 1 with the
    warp carry differs from a chain-restart dispatch of the same frame).

    This is the >=30 fps serving combination for full-mask streams: the
    fullframe generator costs ~21.5 ms/frame at 512x910 vs ~35.7 ms for
    the 170-tile bucket-256 tiled program (docs/perf/chain_parts_r5.json),
    skipping the gather/blend and the 86 padded tile slots."""
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

    def make_engine(out_dir):
        return StyleTransferInference(compose(
            root / "config", "inference", overrides=[
                f"paths.checkpoint={tmp_path}/ckpt/last",
                f"paths.input_dir={base}/input",
                f"paths.mask_dir={base}/mask",
                f"paths.output_dir={out_dir}",
                "paths.additional_channels={}",
                "data.patch_size=16", "inference.use_gpu=false",
                "inference.mode=fullframe",
                "+inference.temporal.enabled=true",
                "+inference.temporal.flow_source=device",
                "+inference.temporal.depth=3",
            ]))

    make_engine(tmp_path / "loop").process_directory()
    files = sorted((base / "input").glob("*.png"))
    assert len(files) == 5

    # manual drive: the same _chain_step composition the loop runs,
    # loading through the engine's own stagers
    eng = make_engine(tmp_path / "manual")
    carry, boxes = (None, None), None
    restart_u8 = None
    for i, p in enumerate(files):
        frame, mask, _, _, fboxes, _ = eng._load_for_dispatch(
            p, base / "mask", False)
        arr = np.asarray(Image.open(base / "mask" / f"{p.stem}.jpg")
                         .convert("L"))
        aux = np.packbits(arr > 127) if eng.mask_packed \
            else (arr > 127).astype(np.uint8)
        if i == 1:
            # chain-restart dispatch of the same frame (fresh carry):
            # different guide channels => different output
            r_u8, _, _ = eng._chain_step(frame, mask, fboxes,
                                         (None, None), aux=aux)
            restart_u8 = np.asarray(r_u8)
        u8, boxes, carry = eng._chain_step(frame, mask, fboxes, carry,
                                           aux=aux, label=p.name)
        assert boxes == []  # the fullframe program path, not tiled
        got = np.asarray(u8)
        want = np.asarray(Image.open(tmp_path / "loop" / p.name))
        np.testing.assert_array_equal(got, want, err_msg=p.name)
        if i == 1:
            assert not np.array_equal(got, restart_u8), \
                "warp carry did not reach the generator input"


def test_temporal_crop_readback_byte_identical(tmp_path):
    """Temporal chain with a PARTIAL mask: crop_readback=auto fetches only
    the mask-support bbox and reconstructs the rest from the input bytes —
    outputs must be byte-identical to crop_readback=off, and the crop must
    actually engage (bbox smaller than the frame)."""
    from optical_flow import OpticalFlowCalculator

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference
    from patch_toon_tpu.train import StyleTransferModel
    from patch_toon_tpu.train.checkpoints import CheckpointManager

    rng = np.random.default_rng(5)
    base = tmp_path / "scene"
    for sub in ("input", "mask"):
        (base / sub).mkdir(parents=True)
    h, w = 96, 192  # big enough that the 64-aligned bbox < 0.85 * frame
    bg = (rng.random((h, w, 3)) * 160).astype(np.uint8)
    for i in range(3):
        frame = bg.copy()
        x0 = 10 + 6 * i
        frame[12:40, x0:x0 + 20] = (rng.random(3) * 100 + 155).astype(
            np.uint8)
        Image.fromarray(frame).save(base / "input" / f"{i:03d}.png")
        mask = np.zeros((h, w), np.uint8)
        mask[4:52, 4:60] = 255  # support well inside one aligned tile
        Image.fromarray(mask).save(base / "mask" / f"{i:03d}.png")
    OpticalFlowCalculator(
        base / "input", base / "flow_fwd", base / "flow_bwd",
        base / "mask", backend="tpu").calculate_flows()

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

    def run(out_dir, crop):
        cfg = compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={tmp_path}/ckpt/last",
            f"paths.input_dir={base}/input",
            f"paths.mask_dir={base}/mask",
            f"paths.output_dir={out_dir}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            f"inference.crop_readback={crop}",
            "+inference.temporal.enabled=true",
            f"+inference.temporal.flow_dir={base}/flow_bwd",
            "+inference.temporal.depth=3",
        ])
        eng = StyleTransferInference(cfg)
        eng.process_directory()
        return eng

    eng = run(tmp_path / "crop", "auto")
    assert getattr(eng, "_last_crop", None) is not None  # crop engaged
    y0, y1, x0, x1 = eng._last_crop
    assert (y1 - y0) * (x1 - x0) < h * w
    run(tmp_path / "nocrop", "off")
    outs = sorted((tmp_path / "crop").glob("*.png"))
    assert len(outs) == 3
    for p in outs:
        a = np.asarray(Image.open(p))
        b = np.asarray(Image.open(tmp_path / "nocrop" / p.name))
        np.testing.assert_array_equal(a, b, err_msg=p.name)


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


def test_device_flow_packed_mask_identical():
    """The bit-packed flow-mask wire form (mask_upload=packed riding the
    temporal chain) unpacks on device to the exact dense-mask result."""
    from patch_toon_tpu.infer.engine import _temporal_device_flow
    from patch_toon_tpu.ops.flow import pil_gray

    rng = np.random.default_rng(9)
    base = (rng.random((48, 72, 3)) * 255).astype(np.uint8)
    cur = np.roll(base, 2, axis=1)
    m = np.zeros((48, 72), np.uint8)
    m[10:40, 16:60] = 1
    g0 = pil_gray(jnp.asarray(base))
    dense, _ = _temporal_device_flow(
        jnp.asarray(cur), g0, jnp.asarray(m), 1)
    packed, _ = _temporal_device_flow(
        jnp.asarray(cur), g0, jnp.asarray(np.packbits(m > 0)), 1)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(packed))
    assert np.asarray(dense)[m == 0].max() == 0


def _ckpt6(tmp_path):
    """Random-weight 6-channel temporal checkpoint (shared helper)."""
    from patch_toon_tpu.train import StyleTransferModel
    from patch_toon_tpu.train.checkpoints import CheckpointManager

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
    return tmp_path / "ckpt" / "last"


def _stream_scene(root, name, seed, n=4, h=48, w=64):
    """One moving-square stream under root/input/<name>, root/mask/<name>."""
    rng = np.random.default_rng(seed)
    (root / "input" / name).mkdir(parents=True, exist_ok=True)
    (root / "mask" / name).mkdir(parents=True, exist_ok=True)
    bg = (rng.random((h, w, 3)) * 160).astype(np.uint8)
    for i in range(n):
        frame = bg.copy()
        x0 = 4 + 4 * i
        frame[12:28, x0:x0 + 12] = (rng.random(3) * 100 + 155).astype(
            np.uint8)
        Image.fromarray(frame).save(root / "input" / name / f"{i:03d}.png")
        mask = np.zeros((h, w), np.uint8)
        mask[4:44, 4:60] = 255
        Image.fromarray(mask).save(root / "mask" / name / f"{i:03d}.jpg")


def test_multistream_temporal_matches_single_stream(tmp_path):
    """Multi-stream temporal serving (subdirectory-per-video, co-batched
    generator dispatch across streams) must match running each stream
    through its own single-stream engine — chains never mix. Device-flow
    mode; ±1 count for the co-batched-vs-single dispatch fusion contexts
    (the same envelope as the pod path)."""
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    ckpt = _ckpt6(tmp_path)
    ms = tmp_path / "ms"
    # unequal lengths: stream c keeps chaining alone once a and b end
    lengths = {"a": 4, "b": 4, "c": 6}
    for k, name in enumerate(("a", "b", "c")):
        _stream_scene(ms, name, seed=20 + k, n=lengths[name])
    root = pathlib.Path(__file__).resolve().parents[1]

    def cfg_for(inp, msk, out):
        return compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={ckpt}",
            f"paths.input_dir={inp}",
            f"paths.mask_dir={msk}",
            f"paths.output_dir={out}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            "inference.precision=32",
            "+inference.temporal.enabled=true",
            "+inference.temporal.depth=3",
            "+inference.temporal.flow_source=device",
        ])

    eng = StyleTransferInference(cfg_for(
        ms / "input", ms / "mask", tmp_path / "out_ms"))
    eng.process_directory()

    for name in ("a", "b", "c"):
        solo = StyleTransferInference(cfg_for(
            ms / "input" / name, ms / "mask" / name,
            tmp_path / f"out_{name}"))
        solo.process_directory()
        outs = sorted((tmp_path / "out_ms" / name).glob("*.png"))
        assert len(outs) == lengths[name], name
        for p in outs:
            a = np.asarray(Image.open(p), np.int16)
            b = np.asarray(
                Image.open(tmp_path / f"out_{name}" / p.name), np.int16)
            assert np.abs(a - b).max() <= 1, f"{name}/{p.name}"


def test_multistream_files_flow_and_detection(tmp_path, temporal_scene):
    """Files-mode flows resolve per stream (temporal.flow_dir/<stream>/),
    and stream detection triggers only on the subdirectory layout."""
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    ckpt = _ckpt6(tmp_path)
    ms = tmp_path / "ms"
    # stream "a": reuse the temporal_scene frames + its tool-written flows
    (ms / "input").mkdir(parents=True)
    (ms / "mask").mkdir(parents=True)
    (ms / "flows").mkdir(parents=True)
    import shutil
    shutil.copytree(temporal_scene / "input", ms / "input" / "a")
    shutil.copytree(temporal_scene / "mask", ms / "mask" / "a")
    shutil.copytree(temporal_scene / "flow_bwd", ms / "flows" / "a")
    root = pathlib.Path(__file__).resolve().parents[1]

    def run(inp, msk, out, fdir):
        cfg = compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={ckpt}",
            f"paths.input_dir={inp}",
            f"paths.mask_dir={msk}",
            f"paths.output_dir={out}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            "inference.precision=32",
            "+inference.temporal.enabled=true",
            "+inference.temporal.depth=3",
            f"+inference.temporal.flow_dir={fdir}",
            "+inference.temporal.flow_upload=f32",
        ])
        eng = StyleTransferInference(cfg)
        eng.process_directory()
        return eng

    eng = run(ms / "input", ms / "mask", tmp_path / "out_ms", ms / "flows")
    assert eng._detect_streams(ms / "input") == ["a"]
    # flat layout must NOT detect streams
    assert eng._detect_streams(temporal_scene / "input") == []
    run(ms / "input" / "a", ms / "mask" / "a", tmp_path / "out_a",
        ms / "flows" / "a")
    outs = sorted((tmp_path / "out_ms" / "a").glob("*.png"))
    assert len(outs) == 5
    for p in outs:
        a = np.asarray(Image.open(p), np.int16)
        b = np.asarray(Image.open(tmp_path / "out_a" / p.name), np.int16)
        assert np.abs(a - b).max() <= 1, p.name


def test_watch_multistream(tmp_path):
    """Watch mode over the subdirectory-per-video layout: chains persist
    across polls (frames arriving in waves match the one-shot multi-stream
    run to the same ±1 fusion envelope), and outputs land per stream."""
    import shutil
    import threading
    import time

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    ckpt = _ckpt6(tmp_path)
    ms = tmp_path / "ms"
    lengths = {"a": 4, "b": 5}
    for k, name in enumerate(("a", "b")):
        _stream_scene(ms, name, seed=30 + k, n=lengths[name])
    root = pathlib.Path(__file__).resolve().parents[1]

    def cfg_for(inp, msk, out, extra=()):
        return compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={ckpt}",
            f"paths.input_dir={inp}",
            f"paths.mask_dir={msk}",
            f"paths.output_dir={out}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            "inference.precision=32",
            "+inference.temporal.enabled=true",
            "+inference.temporal.depth=3",
            "+inference.temporal.flow_source=device",
            *extra,
        ])

    # one-shot reference over the full streams
    StyleTransferInference(cfg_for(
        ms / "input", ms / "mask", tmp_path / "ref")).process_directory()

    # watch run: first 2 frames of each stream now, the rest arrive live
    win, wmask = tmp_path / "win", tmp_path / "wmask"
    for name, n in lengths.items():
        (win / name).mkdir(parents=True)
        (wmask / name).mkdir(parents=True)
        for i in range(2):
            shutil.copy(ms / "input" / name / f"{i:03d}.png", win / name)
            shutil.copy(ms / "mask" / name / f"{i:03d}.jpg", wmask / name)
    eng = StyleTransferInference(cfg_for(
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
                tmp_path / "wout" / "b" / "001.png").exists():
            time.sleep(0.5)
        assert (tmp_path / "wout" / "b" / "001.png").exists()
        for name, n in lengths.items():
            for i in range(2, n):
                shutil.copy(ms / "input" / name / f"{i:03d}.png",
                            win / name)
                shutil.copy(ms / "mask" / name / f"{i:03d}.jpg",
                            wmask / name)
        deadline = time.time() + 60
        while time.time() < deadline and not (
                tmp_path / "wout" / "b" / "004.png").exists():
            time.sleep(0.5)
        assert (tmp_path / "wout" / "b" / "004.png").exists()
    finally:
        t.join(timeout=120)
    assert not t.is_alive()

    # chained outputs match the one-shot multi-stream run — including the
    # frames whose guides crossed the poll gap (±1: co-batched group
    # composition differs between polls, same envelope as pod/co-batch)
    for name, n in lengths.items():
        for i in range(n):
            a = np.asarray(
                Image.open(tmp_path / "wout" / name / f"{i:03d}.png"),
                np.int16)
            b = np.asarray(
                Image.open(tmp_path / "ref" / name / f"{i:03d}.png"),
                np.int16)
            assert np.abs(a - b).max() <= 1, f"{name}/{i:03d}.png"


def test_watch_multistream_blocked_stream_does_not_stall_others(tmp_path):
    """A frame missing its mask blocks its OWN stream (chain order) but
    the other streams keep serving; the blocked stream's later frames
    wait behind it."""
    import threading

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    ckpt = _ckpt6(tmp_path)
    ms = tmp_path / "ms"
    for k, name in enumerate(("a", "b")):
        _stream_scene(ms, name, seed=40 + k, n=3)
    (ms / "mask" / "a" / "001.jpg").unlink()  # a/001 never gets a mask
    root = pathlib.Path(__file__).resolve().parents[1]

    cfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={ms / 'input'}",
        f"paths.mask_dir={ms / 'mask'}",
        f"paths.output_dir={tmp_path / 'out'}",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "inference.precision=32",
        "+inference.temporal.enabled=true",
        "+inference.temporal.depth=3",
        "+inference.temporal.flow_source=device",
        "inference.watch.enabled=true",
        "inference.watch.poll_seconds=0.3",
        "inference.watch.idle_timeout_seconds=8",
    ])
    eng = StyleTransferInference(cfg)
    t = threading.Thread(target=eng.watch_directory)
    t.start()
    t.join(timeout=240)
    assert not t.is_alive()
    out = tmp_path / "out"
    # b fully served; a served only up to the blocked frame
    assert sorted(p.name for p in (out / "b").glob("*.png")) == [
        "000.png", "001.png", "002.png"]
    assert sorted(p.name for p in (out / "a").glob("*.png")) == ["000.png"]
