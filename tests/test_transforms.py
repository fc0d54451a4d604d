"""data.transforms — the porting-compat callables must agree with the
shipped pipeline (data.io), not just exist.

The reference's dataset/inference compose
``RGBConvert -> ToTensor -> Normalize(0.5, 0.5)`` (reference
src/data/transforms.py via dataset.py:34-44, generator.py:91-101); this
build's pipelines load through data.io directly. These tests pin the
contract that a user porting reference code through the compat callables
gets bit-identical values to the native path.
"""

import numpy as np
from PIL import Image

from patch_toon_tpu.data.io import load_image_rgb, load_mask
from patch_toon_tpu.data.transforms import (
    Compose,
    GrayscaleConvert,
    Normalize,
    RGBConvert,
    ToTensor,
)


def test_rgb_pipeline_matches_data_io(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 17, 3), np.uint8)
    p = tmp_path / "f.png"
    Image.fromarray(img).save(p)

    compose = Compose([RGBConvert(), ToTensor(),
                       Normalize(0.5, 0.5)])
    via_transforms = compose(Image.open(p))
    # native path: byte/255 * 2 - 1 == Normalize(0.5, 0.5) of ToTensor
    via_io = load_image_rgb(p)
    np.testing.assert_array_equal(via_transforms.astype(np.float32), via_io)


def test_rgba_coercion_matches(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (9, 11, 4), np.uint8)
    img[..., 3] = 255  # opaque: RGB conversion is exact byte-drop
    p = tmp_path / "f.png"
    Image.fromarray(img, "RGBA").save(p)

    got = Compose([RGBConvert(), ToTensor(),
                   Normalize(0.5, 0.5)])(Image.open(p))
    np.testing.assert_array_equal(got.astype(np.float32),
                                  load_image_rgb(p))


def test_grayscale_binarize_matches_mask_path(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (15, 13), np.uint8)
    p = tmp_path / "m.png"
    Image.fromarray(img).save(p)

    # reference mask pipeline: L -> point(>128) -> ToTensor
    gray = GrayscaleConvert()(Image.open(p))
    binar = gray.point(lambda v: 255 if v > 128 else 0)
    via_transforms = ToTensor()(binar)[..., 0]
    np.testing.assert_array_equal(via_transforms, load_mask(p))


def test_totensor_accepts_arrays():
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = ToTensor()(arr)
    assert out.shape == (3, 4, 1) and out.dtype == np.float32
    np.testing.assert_allclose(out[..., 0], arr / 255.0)
