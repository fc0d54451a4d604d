"""Native frame-IO runtime tests (C++ PNG codec + threaded loader/writer)."""

import numpy as np
import pytest
from PIL import Image

from patch_toon_tpu.native import (
    FrameLoader,
    FrameWriter,
    decode_png,
    encode_png,
    native_available,
)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    arrays = []
    for i in range(6):
        arr = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:03d}.png")
        arrays.append(arr)
    return d, arrays


def test_native_builds():
    assert native_available(), "native frameio failed to build"


def test_decode_matches_pil(png_dir):
    d, arrays = png_dir
    for i, want in enumerate(arrays):
        got = decode_png(str(d / f"{i:03d}.png"))
        np.testing.assert_array_equal(got, want)


def test_decode_rgba_and_gray(tmp_path):
    rng = np.random.default_rng(1)
    rgba = (rng.random((20, 30, 4)) * 255).astype(np.uint8)
    Image.fromarray(rgba, "RGBA").save(tmp_path / "a.png")
    np.testing.assert_array_equal(decode_png(str(tmp_path / "a.png")), rgba)
    gray = (rng.random((20, 30)) * 255).astype(np.uint8)
    Image.fromarray(gray, "L").save(tmp_path / "g.png")
    got = decode_png(str(tmp_path / "g.png"))
    np.testing.assert_array_equal(got[..., 0], gray)


def test_encode_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    arr = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
    encode_png(str(tmp_path / "o.png"), arr)
    # PIL must be able to read our PNG back bit-exactly
    back = np.asarray(Image.open(tmp_path / "o.png"))
    np.testing.assert_array_equal(back, arr)


def test_palette_png_falls_back(tmp_path):
    arr = np.zeros((10, 10), np.uint8)
    img = Image.fromarray(arr).convert("P")
    img.save(tmp_path / "p.png")
    out = decode_png(str(tmp_path / "p.png"))  # PIL fallback path
    assert out.shape[:2] == (10, 10)


def test_frame_loader_in_order(png_dir):
    d, arrays = png_dir
    paths = [str(d / f"{i:03d}.png") for i in range(6)]
    with FrameLoader(paths, num_threads=3, window=2) as loader:
        for i, want in enumerate(arrays):
            np.testing.assert_array_equal(loader.get(i), want)


def test_frame_writer_async(tmp_path, png_dir):
    _, arrays = png_dir
    with FrameWriter(num_threads=2) as writer:
        for i, arr in enumerate(arrays):
            writer.submit(str(tmp_path / f"w{i}.png"), arr)
        assert writer.flush() == 0
    for i, arr in enumerate(arrays):
        back = np.asarray(Image.open(tmp_path / f"w{i}.png"))
        np.testing.assert_array_equal(back, arr)
