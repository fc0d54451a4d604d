"""Device-op tests: splatting, advection, Poisson disk, dense flow, resize."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patch_toon_tpu.ops.advect import advect_points, sample_flow_bilinear
from patch_toon_tpu.ops.flow import dense_flow, masked_flow
from patch_toon_tpu.ops.poisson import golden_ratio_color, poisson_disk_sample
from patch_toon_tpu.ops.resize import resize_bilinear, resize_bilinear_np
from patch_toon_tpu.ops.splat import splat_points


def ref_draw_points(output, points, sigma, colors):
    """Numpy replica of reference _draw_points_numba semantics
    (tools/gaussian_filter.py:122-141), sequential order."""
    h, w = output.shape[:2]
    r = int(3 * sigma)
    out = output.copy()
    for i in range(len(points)):
        x, y = points[i]
        color = colors[i]
        y_min, y_max = max(0, int(y - r)), min(h, int(y + r) + 1)
        x_min, x_max = max(0, int(x - r)), min(w, int(x + r) + 1)
        for yi in range(y_min, y_max):
            for xi in range(x_min, x_max):
                wt = np.exp(-(((xi - x) ** 2 + (yi - y) ** 2)) / (sigma * sigma))
                out[yi, xi] = out[yi, xi] * (1 - wt) + color * wt
    return out


def test_splat_matches_reference_semantics(rng):
    h, w, sigma = 40, 50, 2.5
    base = rng.random((h, w, 3)).astype(np.float32)
    points = np.array([[10.3, 12.7], [11.9, 13.1], [45.5, 2.2], [0.5, 38.9]],
                      np.float32)
    colors = rng.random((4, 3)).astype(np.float32)
    ref = ref_draw_points(base, points, sigma, colors)
    got = np.asarray(splat_points(
        jnp.asarray(base), jnp.asarray(points), jnp.asarray(colors),
        jnp.ones(4, bool), sigma))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_splat_invalid_points_noop(rng):
    base = rng.random((20, 20, 3)).astype(np.float32)
    got = np.asarray(splat_points(
        jnp.asarray(base), jnp.asarray([[10.0, 10.0]]),
        jnp.asarray([[1.0, 0.0, 0.0]]), jnp.zeros(1, bool), 2.0))
    np.testing.assert_array_equal(got, base)


def ref_sample_bilinear(flow, point):
    """Replica of _sample_bilinear_numba (gaussian_filter.py:100-120)."""
    h, w = flow.shape[:2]
    x, y = point
    ix, iy = int(np.floor(x)), int(np.floor(y))
    s, t = x - ix, y - iy
    ix0, ix1 = max(0, min(ix, w - 1)), max(0, min(ix + 1, w - 1))
    iy0, iy1 = max(0, min(iy, h - 1)), max(0, min(iy + 1, h - 1))
    return ((1 - s) * (1 - t) * flow[iy0, ix0] + s * (1 - t) * flow[iy0, ix1]
            + (1 - s) * t * flow[iy1, ix0] + s * t * flow[iy1, ix1])


def test_sample_flow_bilinear_parity(rng):
    flow = rng.standard_normal((30, 40, 2)).astype(np.float32)
    pts = np.array([[5.3, 7.8], [0.0, 0.0], [39.0, 29.0], [38.7, 0.2]],
                   np.float32)
    got = np.asarray(sample_flow_bilinear(jnp.asarray(flow), jnp.asarray(pts)))
    for k, p in enumerate(pts):
        np.testing.assert_allclose(got[k], ref_sample_bilinear(flow, p),
                                   atol=1e-5)


def test_advect_points_bounds():
    flow = np.zeros((20, 20, 2), np.float32)
    flow[..., 0] = 5.0  # push +5 in x
    pts = jnp.asarray([[10.0, 10.0], [17.0, 10.0]])
    valid = jnp.ones(2, bool)
    new_pts, new_valid = advect_points(jnp.asarray(flow), pts, valid)
    assert np.asarray(new_valid).tolist() == [True, False]  # 22 > 19
    np.testing.assert_allclose(np.asarray(new_pts)[0], [15.0, 10.0])


def test_poisson_disk_properties():
    mask = np.zeros((64, 64), np.uint8)
    mask[8:56, 8:56] = 255
    pts = poisson_disk_sample(mask, radius=6.0, seed=3)
    assert len(pts) > 10
    # inside mask
    for x, y in pts:
        assert mask[int(y), int(x)] > 64
    # min-distance property
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    d2[np.diag_indices(len(pts))] = np.inf
    assert d2.min() >= 6.0 ** 2 - 1e-6
    # deterministic
    pts2 = poisson_disk_sample(mask, radius=6.0, seed=3)
    np.testing.assert_array_equal(pts, pts2)


def test_golden_ratio_colors_unique():
    colors = [golden_ratio_color(i) for i in range(50)]
    assert len({tuple(np.round(c, 6)) for c in colors}) == 50


def test_dense_flow_recovers_translation():
    rng = np.random.default_rng(0)
    base = rng.random((96, 128)).astype(np.float32)
    # smooth the pattern so LK's linearization holds
    from patch_toon_tpu.ops.flow import _box_filter

    base = np.asarray(_box_filter(jnp.asarray(base)[..., None], 7))[..., 0] / 49.0
    dx, dy = 3, -2
    # img2 is img1 moved BY (dx, dy): img2(y, x) = img1(y - dy, x - dx),
    # so flow(img1->img2) = (dx, dy) in the cv2 convention
    img2 = np.roll(np.roll(base, dy, axis=0), dx, axis=1)
    flow = np.asarray(dense_flow(jnp.asarray(base), jnp.asarray(img2),
                                 levels=3, iters=6, window=15))
    interior = flow[20:-20, 20:-20]
    assert abs(np.median(interior[..., 0]) - dx) < 0.5
    assert abs(np.median(interior[..., 1]) - dy) < 0.5


def test_dense_flow_scale_recovers_translation():
    """scale=2 (LK on a downsampled pyramid, displacements upsampled)
    recovers a rigid translation at full output resolution; scale=1 is
    the exact path (regression: default unchanged); bad scale raises."""
    rng = np.random.default_rng(2)
    base = rng.random((96, 128)).astype(np.float32)
    from patch_toon_tpu.ops.flow import _box_filter

    base = np.asarray(_box_filter(jnp.asarray(base)[..., None], 7))[..., 0] / 49.0
    img2 = np.roll(base, 4, axis=1)  # moved by dx=4
    flow = np.asarray(dense_flow(jnp.asarray(base), jnp.asarray(img2),
                                 levels=3, iters=6, window=15, scale=2))
    assert flow.shape == (96, 128, 2)
    interior = flow[20:-20, 20:-20]
    assert abs(np.median(interior[..., 0]) - 4) < 1.0
    assert abs(np.median(interior[..., 1])) < 1.0
    exact = dense_flow(jnp.asarray(base), jnp.asarray(img2),
                       levels=3, iters=6, window=15, scale=1)
    ref = dense_flow(jnp.asarray(base), jnp.asarray(img2),
                     levels=3, iters=6, window=15)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(ref))
    with pytest.raises(ValueError, match="scale"):
        dense_flow(jnp.asarray(base), jnp.asarray(img2), scale=3)


def test_optical_flow_tool_scale(tmp_path):
    """tools/optical_flow.py --scale plumbs through to dense_flow and
    rejects the dis backend; outputs keep full resolution + mask zeroing."""
    import sys as _sys
    _sys.path.insert(0, "tools")
    from optical_flow import OpticalFlowCalculator
    from PIL import Image

    rng = np.random.default_rng(5)
    base = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    (tmp_path / "input").mkdir()
    (tmp_path / "mask").mkdir()
    mask = np.zeros((48, 64), np.uint8)
    mask[8:40, 8:56] = 255
    for i, fr in enumerate([base, np.roll(base, 2, axis=1)], start=1):
        Image.fromarray(fr).save(tmp_path / "input" / f"{i:03d}.png")
        Image.fromarray(mask).save(tmp_path / "mask" / f"{i:03d}.jpg")
    OpticalFlowCalculator(
        tmp_path / "input", tmp_path / "fwd", tmp_path / "bwd",
        tmp_path / "mask", scale=2).calculate_flows()
    fwd = np.load(tmp_path / "fwd" / "001.npy")
    assert fwd.shape == (48, 64, 2) and fwd.dtype == np.float32
    assert np.all(fwd[np.asarray(Image.open(
        tmp_path / "mask" / "001.jpg").convert("L")) <= 127] == 0)
    with pytest.raises(ValueError, match="scale"):
        OpticalFlowCalculator(
            tmp_path / "input", tmp_path / "fwd", tmp_path / "bwd",
            tmp_path / "mask", backend="dis", scale=2)


def test_masked_flow_zeroes_outside():
    img = np.random.default_rng(1).random((40, 40)).astype(np.float32)
    mask = np.zeros((40, 40), np.float32)
    mask[10:30, 10:30] = 1.0
    flow = np.asarray(masked_flow(jnp.asarray(img), jnp.asarray(img),
                                  jnp.asarray(mask)))
    assert np.all(flow[mask == 0] == 0)


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).random((1, 13, 17, 2)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    for align in (True, False):
        ref = torch.nn.functional.interpolate(
            xt, size=(29, 31), mode="bilinear", align_corners=align)
        got = np.asarray(resize_bilinear(jnp.asarray(x), (29, 31), align))
        np.testing.assert_allclose(
            got, np.transpose(ref.numpy(), (0, 2, 3, 1)), atol=1e-5)
        got_np = resize_bilinear_np(x[0], (29, 31), align)
        np.testing.assert_allclose(
            got_np, np.transpose(ref.numpy(), (0, 2, 3, 1))[0], atol=1e-5)
