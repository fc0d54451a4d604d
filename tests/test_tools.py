"""Tool-chain tests: imageprocessor, optical flow, gaussian filter, pipeline."""

import sys
import pathlib

import numpy as np
import pytest
from PIL import Image

TOOLS = pathlib.Path(__file__).resolve().parents[1] / "tools"
if str(TOOLS) not in sys.path:
    sys.path.insert(0, str(TOOLS))


@pytest.fixture()
def rgba_scene(tmp_path):
    """A scene of RGBA frames (moving bright square on textured bg)."""
    rng = np.random.default_rng(5)
    src = tmp_path / "src" / "input"
    src.mkdir(parents=True)
    bg = (rng.random((60, 80, 3)) * 128).astype(np.uint8)
    for i in range(1, 6):
        frame = bg.copy()
        x0 = 8 + 6 * (i - 1)
        frame[20:40, x0:x0 + 20] = (rng.random(3) * 127 + 128).astype(np.uint8)
        alpha = np.zeros((60, 80), np.uint8)
        alpha[12:52, 4:76] = 255
        rgba = np.dstack([frame, alpha])
        Image.fromarray(rgba, "RGBA").save(src / f"{i:03d}.png")
    return tmp_path


def test_imageprocessor(rgba_scene):
    from imageprocessor import ImageProcessor

    out = rgba_scene / "proc"
    ImageProcessor(rgba_scene / "src", out, size_mode="scale",
                   size_value=0.5).process_directory()
    inputs = sorted((out / "input").glob("*.png"))
    masks = sorted((out / "mask").glob("*.jpg"))
    assert len(inputs) == 5 and len(masks) == 5
    img = Image.open(inputs[0])
    assert img.size == (40, 30)


def test_optical_flow_tpu_backend(rgba_scene, tmp_path):
    from imageprocessor import ImageProcessor
    from optical_flow import OpticalFlowCalculator

    out = rgba_scene / "proc2"
    ImageProcessor(rgba_scene / "src", out, size_mode="scale",
                   size_value=1.0).process_directory()

    calc = OpticalFlowCalculator(
        out / "input", out / "flow_fwd", out / "flow_bwd", out / "mask",
        "%03d", backend="tpu")
    calc.calculate_flows()
    fwd = sorted((out / "flow_fwd").glob("*.npy"))
    bwd = sorted((out / "flow_bwd").glob("*.npy"))
    assert len(fwd) == 4 and len(bwd) == 4
    flow = np.load(fwd[0])
    assert flow.shape == (60, 80, 2) and flow.dtype == np.float32
    # the square moves +6 px in x per frame; inside the moving region the
    # flow should be clearly positive in x
    region = flow[22:38, 16:26, 0]
    assert np.median(region) > 2.0


@pytest.mark.skipif(
    not pytest.importorskip("cv2", reason="cv2 absent"), reason="cv2 absent")
def test_optical_flow_dis_backend_agrees_on_translation(tmp_path):
    """Our TPU flow and cv2 DIS should agree on a clean translation."""
    import cv2
    import jax.numpy as jnp

    from patch_toon_tpu.ops.flow import dense_flow

    rng = np.random.default_rng(2)
    base = (rng.random((96, 128)) * 255).astype(np.uint8)
    base = cv2.GaussianBlur(base, (7, 7), 2.0)
    img2 = np.roll(base, 4, axis=1)  # move +4 px in x

    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
    ref = dis.calc(base, img2, None)
    got = np.asarray(dense_flow(jnp.asarray(base, jnp.float32) / 255,
                                jnp.asarray(img2, jnp.float32) / 255))
    ref_med = np.median(ref[24:-24, 24:-24, 0])
    got_med = np.median(got[24:-24, 24:-24, 0])
    assert abs(ref_med - 4.0) < 1.0
    assert abs(got_med - 4.0) < 1.0


def test_full_pipeline_and_gaussian_filter(rgba_scene):
    from process_pipeline import process_pipeline

    out = rgba_scene / "pipe"
    process_pipeline(str(rgba_scene / "src"), str(out),
                     resize_mode="scale", resize_value=1.0,
                     flow_backend="tpu")
    for sub in ("input", "mask", "flow_fwd", "flow_bwd",
                "gauss_r10_s10", "gauss_r10_s15"):
        assert (out / sub).exists(), sub
    gauss = sorted((out / "gauss_r10_s10").glob("*.png"))
    assert len(gauss) == 5
    img0 = np.asarray(Image.open(gauss[0]))
    assert img0.shape == (60, 80, 3)
    # splats must add saturated color over the grayscale mask base
    assert (img0.astype(int).max(-1) - img0.astype(int).min(-1)).max() > 60


def test_texture_mapper(rgba_scene):
    from texture_mapper import process_directory

    src = rgba_scene / "src" / "input"
    process_directory(str(src), grid_size=8)
    maps = sorted(src.glob("*_map.png"))
    assert len(maps) == 5
    arr = np.asarray(Image.open(maps[0]))
    assert arr.shape[-1] == 4  # alpha preserved
    alpha = np.asarray(Image.open(sorted(src.glob("00*.png"))[0]))[..., 3]


def test_flow_debug_visualizer(rgba_scene):
    from imageprocessor import ImageProcessor
    from optical_flow import OpticalFlowCalculator
    from flow_debug import FlowDebugVisualizer

    out = rgba_scene / "proc3"
    ImageProcessor(rgba_scene / "src", out, size_mode="scale",
                   size_value=1.0).process_directory()
    OpticalFlowCalculator(out / "input", out / "flow_fwd", out / "flow_bwd",
                          out / "mask", backend="tpu").calculate_flows()
    viz = FlowDebugVisualizer(str(out / "input"), str(out / "flow_fwd"),
                              str(out / "viz"), frame_start=1, frame_end=2)
    viz.visualize_all()
    assert len(list((out / "viz").glob("flow_*.png"))) == 2
