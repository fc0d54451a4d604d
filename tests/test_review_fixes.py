"""Round-3 self-review fixes (inline code review, second half of r3).

Covers: the crop_upload window covering mask speckle outside the tile
read-union (bit-parity hole), image listing accepting .jpeg/uppercase
extensions everywhere inference scans directories, strict data.sampling
validation, the QuantConv uncalibrated-scale dynamic fallback, and the
device-resident (boxes, weights) pack cache.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))


# ---------------------------------------------------------------------------
# crop_upload window must cover the mask support, not just the tile union
# ---------------------------------------------------------------------------

def test_upload_crop_window_covers_mask_support():
    from patch_toon_tpu.infer.engine import upload_crop_window

    h, w, ps = 1024, 1024, 80
    boxes = [(100, 180, 100, 180)]  # one tile top-left
    # no support bbox: window hugs the tile read footprint
    win = upload_crop_window(boxes, h, w, ps)
    assert win is not None
    y0, y1, x0, x1 = win
    assert y1 <= 512 and x1 <= 512  # nowhere near the far corner

    # a speckle mask pixel at (900, 900) that tile placement skipped must
    # land inside the window — outside it the host paste keeps input bytes
    # while the full-frame program composites the zero canvas there
    win2 = upload_crop_window(boxes, h, w, ps,
                              support_bbox=(100, 901, 100, 901))
    assert win2 is None or (win2[0] <= 900 < win2[1]
                            and win2[2] <= 900 < win2[3])
    # (None means the widened window covered >=90% of the frame: the code
    # falls back to the full-frame dispatch, which is trivially identical)

    # empty support bbox (all-zero mask) must not disturb the window
    assert upload_crop_window(boxes, h, w, ps,
                              support_bbox=(0, 0, 0, 0)) == win


# ---------------------------------------------------------------------------
# extension handling: .jpeg and uppercase must be listed like .png/.jpg
# ---------------------------------------------------------------------------

def test_image_files_accepts_jpeg_and_uppercase(tmp_path):
    from PIL import Image

    from patch_toon_tpu.infer.engine import _image_files

    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    for name in ("a.png", "b.jpg", "c.jpeg", "d.PNG", "e.JPG", "f.JPEG"):
        img.save(tmp_path / name)
    (tmp_path / "notes.txt").write_text("not an image")
    names = [p.name for p in _image_files(tmp_path)]
    assert names == ["a.png", "b.jpg", "c.jpeg", "d.PNG", "e.JPG", "f.JPEG"]


# ---------------------------------------------------------------------------
# strict data.sampling knob
# ---------------------------------------------------------------------------

def test_sampling_knob_strict(tmp_path):
    from PIL import Image

    from patch_toon_tpu.data import StyleTransferDataset

    for d in ("input", "output", "mask"):
        (tmp_path / d).mkdir()
    Image.fromarray(np.full((96, 96, 3), 200, np.uint8)).save(
        tmp_path / "input" / "001.png")
    Image.fromarray(np.full((96, 96, 3), 90, np.uint8)).save(
        tmp_path / "output" / "001.png")
    Image.fromarray(np.full((96, 96), 255, np.uint8)).save(
        tmp_path / "mask" / "001.jpg")

    kwargs = dict(dir_pre=str(tmp_path / "input"),
                  dir_post=str(tmp_path / "output"),
                  dir_mask=str(tmp_path / "mask"), patch_size=32)
    for bad in ("Permutation", "permuation", "perm", "random"):
        with pytest.raises(ValueError):
            StyleTransferDataset(sampling=bad, **kwargs)
    StyleTransferDataset(sampling="permutation", **kwargs)  # ok


# ---------------------------------------------------------------------------
# QuantConv: uncalibrated int8 falls back to a per-batch dynamic scale
# ---------------------------------------------------------------------------

def test_quantconv_uncalibrated_dynamic_fallback():
    import jax
    import jax.numpy as jnp

    from patch_toon_tpu.models.layers import QuantConv

    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.5, (1, 8, 8, 4)).astype(np.float32))
    ref = QuantConv(features=4, kernel_size=3, padding=1, mode="calib")
    v = ref.init(jax.random.PRNGKey(0), x)
    y_fp, _ = ref.apply(v, x, mutable=["quant"])

    q = QuantConv(features=4, kernel_size=3, padding=1, mode="int8")
    # NO calibration pass: quant/a_scale stays at its zeros init. The old
    # code clamped the scale to 1e-12 (every activation -> +/-127, garbage);
    # the dynamic fallback must stay close to the fp conv instead.
    y_q = q.apply(v, x)
    err = float(jnp.max(jnp.abs(y_q - y_fp)))
    scale = float(jnp.max(jnp.abs(y_fp)))
    assert err < 0.05 * max(scale, 1.0), (err, scale)


# ---------------------------------------------------------------------------
# pack cache: a repeated tile layout reuses the device-resident upload
# ---------------------------------------------------------------------------

def test_packed_cache_reuses_device_arrays():
    from patch_toon_tpu.infer.engine import StyleTransferInference
    from patch_toon_tpu.infer.tiling import pack_boxes

    class Stub:  # no engine construction needed for the cache helper
        _pack_cache = {}
        _pack_cache_cap = 2
        _packed_cached = StyleTransferInference._packed_cached

    s = Stub()
    boxes = ((0, 80, 0, 80), (40, 120, 40, 120))
    a1 = s._packed_cached(("single", boxes, 32),
                          lambda: pack_boxes(list(boxes), 80, 32)[:2])
    a2 = s._packed_cached(("single", boxes, 32),
                          lambda: pack_boxes(list(boxes), 80, 32)[:2])
    assert a1[0] is a2[0] and a1[1] is a2[1]  # no re-upload
    # FIFO eviction keeps the cache bounded
    s._packed_cached(("single", boxes, 64),
                     lambda: pack_boxes(list(boxes), 80, 64)[:2])
    s._packed_cached(("single", boxes, 128),
                     lambda: pack_boxes(list(boxes), 80, 128)[:2])
    assert len(s._pack_cache) <= 2
