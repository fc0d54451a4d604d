"""w8a8 int8-MXU serving path (models/layers.py QuantConv,
inference.quantize=int8).

No reference equivalent (the reference serves fp16 CUDA,
/root/reference/generator.py:184-185); this is a TPU-native serving knob —
conv math runs int8xint8->int32 on the int8 MXU (measured throughput in
the QuantConv docstring / docs/perf/quant_r3.json).
"""
import pathlib
import sys

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from patch_toon_tpu.models.generator import GeneratorJ  # noqa: E402
from patch_toon_tpu.models.layers import QuantConv  # noqa: E402


def test_quantconv_int8_math_matches_manual():
    """QuantConv(int8) == the manual symmetric-quant formula exactly."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-2.0, 2.0, (2, 9, 9, 4)).astype(np.float32)
    conv = QuantConv(features=5, kernel_size=3, stride=1, padding=1,
                     use_bias=True, mode="int8")
    v = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(v["params"]["kernel"])
    bias = np.asarray(v["params"]["bias"])
    a_amax = float(np.abs(x).max())
    y = conv.apply({"params": v["params"],
                    "quant": {"a_scale": jnp.asarray(a_amax)}},
                   jnp.asarray(x))

    s = a_amax / 127.0
    xq = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    w_s = np.abs(kernel).max(axis=(0, 1, 2)) / 127.0
    wq = np.round(kernel / w_s).astype(np.int8)
    import jax.lax as lax
    acc = np.asarray(lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32))
    expected = acc.astype(np.float32) * (s * w_s) + bias
    np.testing.assert_allclose(np.asarray(y), expected, rtol=0, atol=1e-5)


def test_generator_calib_then_int8_tracks_fp():
    """Calib mode is numerically the fp forward and records one scale per
    quantized conv (all but the 1x1 head); int8 mode then tracks the fp
    output closely on IN-normalized activations."""
    g_args = dict(input_channels=6, use_bias=True, tanh=True,
                  append_smoothers=True, resnet_blocks=2,
                  filters=[8, 16, 32, 32, 32, 16],
                  norm_layer="instance_norm")
    gen = GeneratorJ(**g_args)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (3, 48, 48, 6)).astype(np.float32))
    v = gen.init(jax.random.PRNGKey(0), x[:1])
    fp_vars = {"params": v["params"],
               "batch_stats": v.get("batch_stats", {})}
    y_ref = gen.apply(fp_vars, x, train=False)

    calib = gen.clone(quant_mode="calib")
    y_calib, mut = calib.apply(fp_vars, x, train=False, mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(y_calib), np.asarray(y_ref))
    scales = jax.tree_util.tree_leaves(mut["quant"])
    # stem + 2 downsamples + 2*2 resnet convs + 2 upsamples + conv11
    # + 2 smoothers = 12 quantized convs; the output head is NOT quantized
    assert len(scales) == 12
    assert all(float(s) > 0 for s in scales)

    q = gen.clone(quant_mode="int8")
    y_q = q.apply({**fp_vars, "quant": mut["quant"]}, x, train=False)
    err = np.abs(np.asarray(y_q) - np.asarray(y_ref))
    assert err.max() < 0.02, err.max()
    assert err.mean() < 0.003, err.mean()


def test_engine_quantize_int8_e2e(tmp_path):
    """inference.quantize=int8 through the real engine: first-frame
    auto-calibration, then every output tracks the fp run closely inside
    the mask and equals the input bytes exactly outside it."""
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference
    from patch_toon_tpu.train import StyleTransferModel
    from patch_toon_tpu.train.checkpoints import CheckpointManager

    rng = np.random.default_rng(5)
    scene = tmp_path / "scene"
    for sub in ("input", "mask"):
        (scene / sub).mkdir(parents=True)
    h, w = 96, 128
    mask = np.zeros((h, w), np.uint8)
    mask[24:72, 32:96] = 255
    for i in range(3):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(scene / "input" / f"{i:03d}.png")
        Image.fromarray(mask).save(scene / "mask" / f"{i:03d}.png")

    g_args = dict(input_channels=3, use_bias=True, tanh=True,
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
        meta={"input_channels": 3, "generator_args": g_args,
              "patch_size": 16},
    ).save(state, epoch=0, score=1.0)

    root = pathlib.Path(__file__).resolve().parents[1]
    engines = {}
    for qmode in ("off", "int8"):
        icfg = compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={tmp_path}/ckpt/last",
            f"paths.input_dir={scene}/input",
            f"paths.mask_dir={scene}/mask",
            f"paths.output_dir={tmp_path}/styl_{qmode}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            f"inference.quantize={qmode}",
        ])
        engines[qmode] = StyleTransferInference(icfg)
        engines[qmode].process_directory()

    assert "quant" in engines["int8"].g_vars  # calibration ran once
    assert "quant" not in engines["off"].g_vars
    sel = mask > 0
    for i in range(3):
        name = f"{i:03d}.png"
        a = np.asarray(Image.open(tmp_path / "styl_off" / name), np.int64)
        b = np.asarray(Image.open(tmp_path / "styl_int8" / name), np.int64)
        inp = np.asarray(Image.open(scene / "input" / name))
        # outside the mask: the composite passes input bytes through in
        # BOTH modes (quantization never touches the composite)
        assert np.array_equal(b[~sel], inp[~sel]), name
        mse = ((a - b)[sel] ** 2).mean()
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr > 35.0, (name, psnr)


def test_engine_quantize_knob_validation(tmp_path):
    from patch_toon_tpu.infer.engine import StyleTransferInference  # noqa
    from patch_toon_tpu.config import compose

    root = pathlib.Path(__file__).resolve().parents[1]
    icfg = compose(root / "config", "inference", overrides=[
        "paths.checkpoint=/nonexistent",
        "inference.quantize=int4",
    ])
    with pytest.raises(ValueError, match="quantize"):
        StyleTransferInference(icfg)
