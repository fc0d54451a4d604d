"""Data layer tests: crop semantics, mask morphology, device dataset."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patch_toon_tpu.ops.masks import dilate_valid_centers, erode_full_support
from patch_toon_tpu.ops.patches import cut_patches, pad_images_for_gather


def ref_cut_patch(tensor_hwc: np.ndarray, y: int, x: int, size: int) -> np.ndarray:
    """Numpy replica of the reference crop semantics (dataset.py:209-232):
    crop [max(0,y-s/2) : min(y+s/2, H-1)] x [...W-1], zero-pad top-left anchored."""
    h, w, c = tensor_hwc.shape
    half = size // 2
    hn, hx = max(0, y - half), min(y + half, h - 1)
    xn, xx = max(0, x - half), min(x + half, w - 1)
    patch = tensor_hwc[hn:hx, xn:xx]
    out = np.zeros((size, size, c), tensor_hwc.dtype)
    out[: patch.shape[0], : patch.shape[1]] = patch
    return out


def test_cut_patches_matches_reference_semantics(rng):
    h, w, c, size = 57, 93, 4, 16
    img = rng.standard_normal((1, h, w, c)).astype(np.float32)
    padded = pad_images_for_gather(jnp.asarray(img), size)
    sizes = jnp.asarray([[h, w]], dtype=jnp.int32)

    centers = [(0, 0), (h - 1, w - 1), (8, 8), (h // 2, w // 2),
               (3, w - 2), (h - 4, 5), (size // 2, size // 2)]
    img_idx = jnp.zeros((len(centers),), jnp.int32)
    ctrs = jnp.asarray(centers, dtype=jnp.int32)
    got = np.asarray(cut_patches(padded, sizes, img_idx, ctrs, size))
    for k, (y, x) in enumerate(centers):
        want = ref_cut_patch(img[0], y, x, size)
        np.testing.assert_array_equal(got[k], want, err_msg=f"center {(y, x)}")


def test_cut_patches_multi_image(rng):
    imgs = rng.standard_normal((3, 40, 40, 2)).astype(np.float32)
    padded = pad_images_for_gather(jnp.asarray(imgs), 8)
    sizes = jnp.asarray([[40, 40]] * 3, jnp.int32)
    got = np.asarray(cut_patches(
        padded, sizes, jnp.asarray([2, 0, 1]), jnp.asarray([[20, 20]] * 3), 8))
    for k, i in enumerate([2, 0, 1]):
        np.testing.assert_array_equal(got[k], ref_cut_patch(imgs[i], 20, 20, 8))


def test_mask_morphology_against_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    mask = (rng.random((31, 47)) > 0.6).astype(np.float32)
    t = torch.from_numpy(mask)[None, None]
    weights = torch.ones((1, 1, 7, 7))
    conv = F.conv2d(t, weights, stride=1, padding=3)[0, 0].numpy()

    # training-side dilation: nonzero of the conv (dataset.py:170)
    got_dil = np.asarray(dilate_valid_centers(jnp.asarray(mask)))
    np.testing.assert_array_equal(got_dil > 0, conv > 0)

    # inference-side erosion: zero below full support, /49 (generator.py:344-345)
    ref_er = conv.copy()
    ref_er[ref_er < 49] = 0
    ref_er /= 49
    got_er = np.asarray(erode_full_support(jnp.asarray(mask)))
    np.testing.assert_allclose(got_er, ref_er, atol=1e-6)


@pytest.fixture(scope="module")
def platinum_dirs(reference_path):
    base = reference_path / "test_dataset" / "PlatinumChan_x0.5_train"
    if not base.exists():
        pytest.skip("sample data not present")
    return base


def test_dataset_load_and_sample(platinum_dirs):
    from patch_toon_tpu.data import StyleTransferDataset

    ds = StyleTransferDataset(
        dir_pre=str(platinum_dirs / "input"),
        dir_post=str(platinum_dirs / "output"),
        dir_mask=str(platinum_dirs / "mask"),
        patch_size=80,
        additional_channels={
            "point_vector": {"path": str(platinum_dirs / "tracking"), "depth": 3}
        },
    )
    assert ds.total_input_channels == 6
    assert ds.num_images >= 1
    assert len(ds) > 0

    batch = ds.sample_batch(jax.random.PRNGKey(0), 16)
    assert batch["pre"].shape == (16, 80, 80, 3)
    assert batch["post"].shape == (16, 80, 80, 3)
    assert batch["channels"].shape == (16, 80, 80, 3)
    x = ds.model_input(batch)
    assert x.shape == (16, 80, 80, 6)
    pre = np.asarray(batch["pre"])
    assert pre.min() >= -1.0 and pre.max() <= 1.0
    assert pre.std() > 0.01  # not all zeros


def test_dataset_augmentation(platinum_dirs):
    from patch_toon_tpu.data import StyleTransferDataset

    ds = StyleTransferDataset(
        dir_pre=str(platinum_dirs / "input"),
        dir_post=str(platinum_dirs / "output"),
        dir_mask=str(platinum_dirs / "mask"),
        patch_size=32,
        augmentation_factor=2,
    )
    n1 = len(ds) // 2
    assert len(ds) == 2 * n1  # x augmentation_factor (dataset.py:296-298)
    batch = ds.sample_batch(jax.random.PRNGKey(1), 4)
    assert "already" in batch and batch["already"].shape == (4, 32, 32, 3)


def test_permutation_sampling_without_replacement(platinum_dirs):
    """Permutation mode must visit each image's centers without repeats
    until the pool resets (reference dataset.py:249-256 semantics)."""
    from patch_toon_tpu.data import StyleTransferDataset

    ds = StyleTransferDataset(
        dir_pre=str(platinum_dirs / "input"),
        dir_post=str(platinum_dirs / "output"),
        dir_mask=str(platinum_dirs / "mask"),
        patch_size=32,
        sampling="permutation",
    )
    # host queue variant (reference's exact pop/refill order): uniqueness
    count0 = int(ds.counts_np[0])
    draws = min(count0, 500)
    picks = ds._perm_next_host(np.zeros(draws, np.int64))
    assert len(set(picks.tolist())) == draws  # no repeats within the pool

    # device sampler: fresh perms are true permutations of each pool
    state = ds.init_perm_state(jax.random.PRNGKey(3))
    perm_np = np.asarray(state["perm"])
    for i in range(ds.num_images):
        ci = int(ds.counts_np[i])
        assert sorted(perm_np[i, :ci].tolist()) == list(range(ci))

    # draws advance each image's cursor by its in-batch count and never
    # repeat a slot before its pool wraps (numpy model of the device math)
    B = 8
    draw = jax.jit(lambda s, r: ds.sample_batch_permutation(s, r, B))
    cursors = np.zeros(ds.num_images, np.int64)
    seen = [set() for _ in range(ds.num_images)]
    st = state
    for t in range(4):
        rng = jax.random.PRNGKey(100 + t)
        k_img, _, _ = jax.random.split(rng, 3)
        imgs = np.asarray(jax.random.randint(k_img, (B,), 0, ds.num_images))
        st, batch = draw(st, rng)
        assert batch["pre"].shape == (B, 32, 32, 3)
        for i in imgs:
            slot = int(perm_np[i, cursors[i] % ds.counts_np[i]])
            assert slot not in seen[i]
            seen[i].add(slot)
            cursors[i] += 1
        np.testing.assert_array_equal(
            np.asarray(st["cursor"]), cursors % ds.counts_np)

    # make_sampler: stateful one-dispatch closure — same rng key with
    # advanced state must yield different patches
    sampler = ds.make_sampler(8)
    b1 = sampler(jax.random.PRNGKey(0))
    b2 = sampler(jax.random.PRNGKey(0))
    assert b1["post"].shape == (8, 32, 32, 3)
    assert not np.array_equal(np.asarray(b1["pre"]), np.asarray(b2["pre"]))


def test_multi_sequence_dataset(platinum_dirs, reference_path):
    """Multi-scene (multi-keyframe / multi-style) batched training data."""
    from patch_toon_tpu.data import StyleTransferDataset

    miku = reference_path / "test_dataset" / "miku_smile_x0.5_train"
    scenes = [platinum_dirs]
    if miku.exists():
        scenes.append(miku)
    ds = StyleTransferDataset(
        dir_pre=[str(s / "input") for s in scenes],
        dir_post=[str(s / "output") for s in scenes],
        dir_mask=[str(s / "mask") for s in scenes],
        patch_size=32,
    )
    single = StyleTransferDataset(
        dir_pre=str(platinum_dirs / "input"),
        dir_post=str(platinum_dirs / "output"),
        dir_mask=str(platinum_dirs / "mask"),
        patch_size=32,
    )
    assert ds.num_images >= single.num_images
    if len(scenes) > 1:
        assert ds.num_images > single.num_images
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    assert batch["pre"].shape == (8, 32, 32, 3)


def test_save_debug_batch(platinum_dirs, tmp_path):
    from patch_toon_tpu.data import StyleTransferDataset
    from PIL import Image

    ds = StyleTransferDataset(
        dir_pre=str(platinum_dirs / "input"),
        dir_post=str(platinum_dirs / "output"),
        dir_mask=str(platinum_dirs / "mask"),
        patch_size=32,
    )
    batch = ds.sample_batch(jax.random.PRNGKey(0), 4)
    ds.save_debug_batch(batch, str(tmp_path / "debug.png"))
    img = np.asarray(Image.open(tmp_path / "debug.png"))
    assert img.ndim == 3 and img.shape[0] > 32


def test_erode_full_support_np_bit_identical():
    """The host (numpy) erosion the inference engine uses per frame must be
    bit-identical to the device conv for binary masks, and refuse
    fractional ones."""
    import pytest

    from patch_toon_tpu.ops.masks import erode_full_support_np

    rng = np.random.default_rng(3)
    for shape in ((67, 93), (48, 64), (7, 7)):
        m = (rng.random(shape) > 0.4).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(erode_full_support(jnp.asarray(m))),
            erode_full_support_np(m))
    with pytest.raises(ValueError):
        erode_full_support_np(np.full((8, 8), 0.7, np.float32))
