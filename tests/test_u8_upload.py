"""uint8 upload parity: frames/masks crossing host->device as uint8 with
on-device normalization must produce byte-identical outputs to the fp32
upload path (the normalization arithmetic is the exact reference transform,
dataset.py:191, applied on-device instead of host-side)."""

import pathlib

import numpy as np
import pytest

import jax
from PIL import Image

from patch_toon_tpu.config import compose
from patch_toon_tpu.infer import StyleTransferInference
from patch_toon_tpu.train import StyleTransferModel
from patch_toon_tpu.train.checkpoints import CheckpointManager

ROOT = pathlib.Path(__file__).resolve().parents[1]

G_ARGS = dict(use_bias=True, tanh=True, append_smoothers=True,
              resnet_blocks=1, filters=[4, 8, 8, 8, 8, 4],
              norm_layer="instance_norm")


def _make_ckpt(tmp_path, channels):
    g_args = dict(G_ARGS, input_channels=channels)
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
        meta={"input_channels": channels, "generator_args": g_args,
              "patch_size": 16},
    ).save(state, epoch=0, score=1.0)
    return tmp_path / "ckpt" / "last"


def _make_scene(tmp_path, n=3, h=96, w=128, with_channel=False):
    rng = np.random.default_rng(11)
    scene = tmp_path / "scene"
    subs = ["input", "mask"] + (["guide"] if with_channel else [])
    for sub in subs:
        (scene / sub).mkdir(parents=True, exist_ok=True)
    mask = np.zeros((h, w), np.uint8)
    mask[20:70, 30:100] = 255
    for i in range(n):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(scene / "input" / f"{i:03d}.png")
        Image.fromarray(mask).save(scene / "mask" / f"{i:03d}.png")
        if with_channel:
            g = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(g).save(scene / "guide" / f"{i:03d}.png")
    return scene


def _run(ckpt, scene, out_dir, upload, extra=()):
    icfg = compose(ROOT / "config", "inference", overrides=[
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={scene}/input",
        f"paths.mask_dir={scene}/mask",
        f"paths.output_dir={out_dir}",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "inference.precision=32",
        f"inference.upload={upload}",
        *extra,
    ])
    eng = StyleTransferInference(icfg)
    eng.process_directory()
    return eng


def _images(d):
    return {p.name: np.asarray(Image.open(p))
            for p in sorted(pathlib.Path(d).glob("*.png"))}


@pytest.mark.parametrize("mode", ["tiled", "fullframe"])
def test_u8_upload_byte_identical(tmp_path, mode):
    ckpt = _make_ckpt(tmp_path, 3)
    scene = _make_scene(tmp_path)
    engines = {}
    for up in ("u8", "f32"):
        engines[up] = _run(ckpt, scene, tmp_path / f"styl_{mode}_{up}", up,
                           extra=[f"inference.mode={mode}"])
    assert engines["u8"].upload_u8 and not engines["f32"].upload_u8
    a = _images(tmp_path / f"styl_{mode}_u8")
    b = _images(tmp_path / f"styl_{mode}_f32")
    assert len(a) == len(b) == 3
    for name in a:
        assert np.array_equal(a[name], b[name]), name


def test_u8_upload_with_guide_channels(tmp_path):
    """uint8 channel concat (RGB + guide bands) matches the fp32 loader's
    load_image_channels normalization exactly."""
    ckpt = _make_ckpt(tmp_path, 5)
    scene = _make_scene(tmp_path, with_channel=True)
    for up in ("u8", "f32"):
        _run(ckpt, scene, tmp_path / f"styl_{up}", up, extra=[
            "paths.additional_channels={guide: {path: '"
            + str(scene / "guide") + "', depth: 2}}",
        ])
    a, b = _images(tmp_path / "styl_u8"), _images(tmp_path / "styl_f32")
    assert len(a) == len(b) == 3
    for name in a:
        assert np.array_equal(a[name], b[name]), name


def test_u8_upload_cobatched_group(tmp_path):
    """The multiframe (frames_per_dispatch>1) program's uint8 path."""
    ckpt = _make_ckpt(tmp_path, 3)
    scene = _make_scene(tmp_path, n=4)
    for up in ("u8", "f32"):
        _run(ckpt, scene, tmp_path / f"grp_{up}", up,
             extra=["+inference.frames_per_dispatch=2"])
    a, b = _images(tmp_path / "grp_u8"), _images(tmp_path / "grp_f32")
    assert len(a) == len(b) == 4
    for name in a:
        assert np.array_equal(a[name], b[name]), name


def test_u8_upload_pod(tmp_path):
    """Pod path (frames sharded over 8 virtual devices), uint8 upload."""
    ckpt = _make_ckpt(tmp_path, 3)
    scene = _make_scene(tmp_path, n=4)
    for up in ("u8", "f32"):
        _run(ckpt, scene, tmp_path / f"pod_{up}", up,
             extra=["inference.devices=8"])
    a, b = _images(tmp_path / "pod_u8"), _images(tmp_path / "pod_f32")
    assert len(a) == len(b) == 4
    for name in a:
        assert np.array_equal(a[name], b[name]), name


def test_upload_knob_strict(tmp_path):
    ckpt = _make_ckpt(tmp_path, 3)
    scene = _make_scene(tmp_path, n=1)
    with pytest.raises(ValueError, match="inference.upload"):
        _run(ckpt, scene, tmp_path / "x", "fast")


def test_upload_auto_per_precision(tmp_path):
    """auto -> u8 for bf16/32_fast, but f32 for strict bit-parity
    precision=32 (TPU fp32 divide rounding is not contractually IEEE)."""
    ckpt = _make_ckpt(tmp_path, 3)
    scene = _make_scene(tmp_path, n=1)
    expectations = {"bf16": True, "32_fast": True, "32": False}
    for prec, want in expectations.items():
        icfg = compose(ROOT / "config", "inference", overrides=[
            f"paths.checkpoint={ckpt}",
            f"paths.input_dir={scene}/input",
            f"paths.mask_dir={scene}/mask",
            f"paths.output_dir={tmp_path}/auto_{prec}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            f"inference.precision={prec}",
        ])
        assert StyleTransferInference(icfg).upload_u8 == want, prec


@pytest.mark.parametrize("mode,extra", [
    ("tiled", []),
    ("fullframe", []),
    ("tiled", ["+inference.frames_per_dispatch=2"]),
    ("tiled", ["inference.devices=8"]),
])
def test_mask_packed_byte_identical(tmp_path, mode, extra):
    """Bit-packed mask upload (inference.mask_upload=packed, the default:
    np.packbits on the wire, jnp.unpackbits in the program — 8x fewer mask
    bytes) is byte-identical to the dense plane upload on every program
    family: tiled, fullframe, co-batched multiframe, pod."""
    ckpt = _make_ckpt(tmp_path, 3)
    scene = _make_scene(tmp_path, n=4)
    tag = f"{mode}_{len(extra)}"
    engines = {}
    for mu in ("packed", "plane"):
        engines[mu] = _run(
            ckpt, scene, tmp_path / f"mp_{tag}_{mu}", "u8",
            extra=[f"inference.mode={mode}",
                   f"inference.mask_upload={mu}", *extra])
    assert engines["packed"].mask_packed
    assert not engines["plane"].mask_packed
    a = _images(tmp_path / f"mp_{tag}_packed")
    b = _images(tmp_path / f"mp_{tag}_plane")
    assert len(a) == len(b) == 4
    for name in a:
        assert np.array_equal(a[name], b[name]), name


def test_mask_packed_strict_precision(tmp_path):
    """Packing is exact (the {0,1} plane is reproduced bit-for-bit), so it
    stays ON in strict precision=32 parity mode — outputs must still match
    the plane upload byte-for-byte there."""
    ckpt = _make_ckpt(tmp_path, 3)
    scene = _make_scene(tmp_path, n=2)
    for mu in ("packed", "plane"):
        _run(ckpt, scene, tmp_path / f"strict_{mu}", "f32",
             extra=[f"inference.mask_upload={mu}"])
    a, b = _images(tmp_path / "strict_packed"), _images(tmp_path / "strict_plane")
    assert len(a) == len(b) == 2
    for name in a:
        assert np.array_equal(a[name], b[name]), name


def test_mask_packed_fractional_falls_back(tmp_path):
    """A fractional mask (public process_large_image API) cannot be packed
    losslessly — _mask_wire must ship the fp32 plane and preserve the
    partial composite."""
    ckpt = _make_ckpt(tmp_path, 3)
    scene = _make_scene(tmp_path, n=1)
    eng = _run(ckpt, scene, tmp_path / "frac", "u8")
    rng = np.random.default_rng(0)
    frame = (rng.random((96, 128, 3)).astype(np.float32) * 2 - 1)
    mask = np.zeros((96, 128), np.float32)
    mask[20:70, 30:100] = 0.5  # half-strength composite
    wire = eng._mask_wire(mask)
    assert wire.dtype == np.float32 and wire.shape == (96, 128, 1)
    out = eng.process_large_image(frame, mask)
    rgb = np.round(np.clip((frame + 1) * 127.5, 0, 255)).astype(np.uint8)
    changed = out != rgb
    assert changed[20:70, 30:100].any()
    assert not changed[~(mask > 0)].any()


def test_mask_upload_knob_strict(tmp_path):
    ckpt = _make_ckpt(tmp_path, 3)
    scene = _make_scene(tmp_path, n=1)
    with pytest.raises(ValueError, match="inference.mask_upload"):
        _run(ckpt, scene, tmp_path / "x", "u8",
             extra=["inference.mask_upload=zip"])
