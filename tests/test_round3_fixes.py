"""Round-3 mechanical-fix tests (VERDICT r2 weak #4-#7, ADVICE r2).

Covers: global training.max_steps semantics, checkpoint_score knob,
crop_readback strict parsing, compute_crop_bbox as the shared bench/engine
crop logic, the two_forward ablation step's parity with the vjp-restructured
default, temporal stream-position resolution, and the permutation sampler's
cursor reset on pool wrap.
"""

import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))


# ---------------------------------------------------------------------------
# crop knob + crop bbox
# ---------------------------------------------------------------------------

def test_crop_knob_strict_parse():
    from patch_toon_tpu.infer.engine import _parse_crop_knob

    assert _parse_crop_knob("auto") is True
    assert _parse_crop_knob("on") is True
    assert _parse_crop_knob(True) is True
    assert _parse_crop_knob("off") is False
    assert _parse_crop_knob(False) is False
    assert _parse_crop_knob("none") is False
    for typo in ("of", "disable", "crop", "yess"):
        with pytest.raises(ValueError):
            _parse_crop_knob(typo)


def test_compute_crop_bbox():
    from patch_toon_tpu.infer.engine import compute_crop_bbox

    h, w = 512, 910
    # interior mask support -> 64-aligned box containing it
    bbox = compute_crop_bbox([(100, 412, 180, 730)], h, w)
    assert bbox == (64, 448, 128, 768)
    y0, y1, x0, x1 = bbox
    assert y0 <= 100 and y1 >= 412 and x0 <= 180 and x1 >= 730
    # maskless frame in the group -> no cropping
    assert compute_crop_bbox([(100, 412, 180, 730), None], h, w) is None
    # near-full mask -> no cropping (saves nothing)
    assert compute_crop_bbox([(0, 512, 0, 900)], h, w) is None
    # all-empty masks -> minimal 1-row fetch, aligned
    bbox = compute_crop_bbox([(0, 0, 0, 0)], h, w)
    assert bbox == (0, 64, 0, 64)
    # union across a group
    bbox = compute_crop_bbox([(10, 20, 10, 20), (400, 440, 700, 800)], h, w)
    assert bbox == (0, 448, 0, 832)


# ---------------------------------------------------------------------------
# temporal stream positions
# ---------------------------------------------------------------------------

def test_temporal_stream_positions_rank_based():
    from patch_toon_tpu.infer.engine import StyleTransferInference

    # bare instances (no __init__): the real methods, including the lazily
    # created per-engine member-set lock, must work on a fresh engine
    def bare():
        e = object.__new__(StyleTransferInference)
        e.temporal_format = "%03d"
        return e

    eng = bare()
    reg = StyleTransferInference._temporal_register
    pos = StyleTransferInference._temporal_position
    # positions are the rank in the sorted member set (flow files index by
    # stream POSITION, not filename number — make_sample_scene names are
    # 1-based)
    assert pos(eng, "001.png") == 0
    assert pos(eng, "002.png") == 1
    assert pos(eng, "001.png") == 0  # idempotent: retries keep position
    assert pos(eng, "zz.png") == 2
    # watch-restart scenario: already-stylized frames registered from their
    # outputs seed the member set, so a late frame continues correctly
    eng2 = bare()
    for n in ("001.png", "002.png", "003.png"):  # outputs already on disk
        reg(eng2, n)
    assert pos(eng2, "004.png") == 3  # NOT 0 (the pre-fix bug)
    # transient-file scenario (review r3): a half-written file that watch
    # mode never settles is never registered, so it cannot shift later
    # frames onto the wrong flow — only settled members get positions
    eng3 = bare()
    reg(eng3, "001.png")
    # "001a.tmp.png" appears in a glob but never settles: NOT registered
    assert pos(eng3, "002.png") == 1
    # an early member discovered late shifts only future positions, toward
    # the true final-list index
    reg(eng3, "000.png")
    assert pos(eng3, "003.png") == 3


# ---------------------------------------------------------------------------
# permutation sampler: cursor resets on wrap (full coverage per cycle)
# ---------------------------------------------------------------------------

def test_permutation_cursor_resets_on_wrap(tmp_path):
    from make_sample_scene import make_scene

    from patch_toon_tpu.data import StyleTransferDataset

    scene = tmp_path / "scene"
    make_scene(str(scene), frames=1, height=48, width=64)
    ds = StyleTransferDataset(
        dir_pre=str(scene / "input"), dir_post=str(scene / "output"),
        dir_mask=str(scene / "mask"), patch_size=16,
        sampling="permutation",
        additional_channels={"point_vector": {
            "path": str(scene / "tracking"), "depth": 3}})
    count = int(np.asarray(ds.counts)[0])
    assert count > 8
    batch_size = 4
    draw = jax.jit(
        lambda st, r: ds.sample_batch_permutation(st, r, batch_size))
    state = ds.init_perm_state(jax.random.PRNGKey(0))

    # non-wrap draw advances the cursor by the batch size
    state2, _ = draw(state, jax.random.PRNGKey(1))
    assert int(np.asarray(state2["cursor"])[0]) == batch_size

    # craft a near-exhausted cursor: the next draw wraps the pool, and the
    # FRESH permutation must start at 0 (not at advanced % count, which
    # would skip its first slots every cycle — ADVICE r2)
    state2["cursor"] = jnp.full_like(state2["cursor"], count - 2)
    state3, _ = draw(state2, jax.random.PRNGKey(2))
    assert int(np.asarray(state3["cursor"])[0]) == 0
    perm_before = np.asarray(state2["perm"])[0, :count]
    perm_after = np.asarray(state3["perm"])[0, :count]
    assert not np.array_equal(perm_before, perm_after)  # re-permuted
    # the fresh permutation still covers every slot exactly once
    assert sorted(perm_after.tolist()) == list(range(count))


# ---------------------------------------------------------------------------
# two_forward ablation step == vjp-restructured step
# ---------------------------------------------------------------------------

def test_two_forward_step_matches_default():
    from patch_toon_tpu.train import StyleTransferModel, make_train_step

    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(
            input_channels=4, use_bias=True, tanh=True,
            append_smoothers=True,  # exercises the BN double-update path
            resnet_blocks=1, filters=[4, 8, 8, 8, 8, 4])},
        discriminator_config={"type": "DiscriminatorN_IN", "args": dict(
            num_filters=4, n_layers=2, use_bias=True, input_channels=3)},
        training_config=dict(
            batch_size=4, reconstruction_weight=4.0, adversarial_weight=0.5,
            use_image_loss=True, reconstruction_criterion="L1Loss",
            adversarial_criterion="MSELoss", precision=32),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
            discriminator=dict(lr=4e-4, betas=[0.9, 0.999],
                               weight_decay=1e-5)),
        data_config=dict(patch_size=16, additional_channels={
            "x": {"path": "unused", "depth": 1}}),
        perception_loss_config=None,
    )
    rng = jax.random.PRNGKey(3)
    batch = {
        "pre": jax.random.uniform(rng, (4, 16, 16, 3)) * 2 - 1,
        "post": jax.random.uniform(jax.random.fold_in(rng, 1),
                                   (4, 16, 16, 3)) * 2 - 1,
        "channels": jax.random.uniform(jax.random.fold_in(rng, 2),
                                       (4, 16, 16, 1)) * 2 - 1,
    }
    results = {}
    for mode in (False, True):
        state = model.init_state(jax.random.PRNGKey(0), patch_size=16)
        step = make_train_step(model, donate=False, two_forward=mode)
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(7 + i))
        results[mode] = (state, metrics)
    s0, m0 = results[False]
    s1, m1 = results[True]
    assert np.allclose(float(m0["g_total_loss"]),
                       float(m1["g_total_loss"]), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s0.g_params), jax.tree.leaves(s1.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(s0.g_batch_stats),
                    jax.tree.leaves(s1.g_batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.d_params), jax.tree.leaves(s1.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# training loop: global max_steps + checkpoint_score
# ---------------------------------------------------------------------------

def _loop_fixture(tmp_path, **tc_extra):
    from make_sample_scene import make_scene

    from patch_toon_tpu.data import StyleTransferDataset
    from patch_toon_tpu.train import StyleTransferModel

    scene = tmp_path / "scene"
    if not scene.exists():
        make_scene(str(scene), frames=2, height=48, width=64)
    ds = StyleTransferDataset(
        dir_pre=str(scene / "input"), dir_post=str(scene / "output"),
        dir_mask=str(scene / "mask"), patch_size=16,
        additional_channels={"point_vector": {
            "path": str(scene / "tracking"), "depth": 3}})
    tc = dict(batch_size=4, reconstruction_weight=4.0,
              adversarial_weight=0.5, use_image_loss=True,
              reconstruction_criterion="L1Loss",
              adversarial_criterion="MSELoss", precision=32,
              log_every_n_steps=100, image_log_freq=10 ** 6,
              early_stopping=False, **tc_extra)
    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(
            input_channels=6, use_bias=True, resnet_blocks=1,
            filters=[4, 8, 8, 8, 8, 4])},
        discriminator_config={"type": "DiscriminatorN_IN", "args": dict(
            num_filters=4, n_layers=2, use_bias=True, input_channels=3)},
        training_config=tc,
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
            discriminator=dict(lr=4e-4, betas=[0.9, 0.999],
                               weight_decay=1e-5)),
        data_config=dict(patch_size=16, additional_channels={
            "point_vector": {"path": "x", "depth": 3}}),
        perception_loss_config=None,
    )
    return model, ds


def test_max_steps_is_global(tmp_path):
    """max_steps caps TOTAL steps across epochs, not steps per epoch
    (VERDICT r2 weak #4): 3 allowed epochs x cap 5 must stop at step 5."""
    from patch_toon_tpu.train.loop import fit

    model, ds = _loop_fixture(tmp_path, max_steps=5)
    state = fit(model, ds, run_dir=str(tmp_path / "run"), max_epochs=3,
                progress=False)
    assert int(np.asarray(state.step)) == 5


def test_checkpoint_score_knob(tmp_path):
    from patch_toon_tpu.train.loop import fit

    model, ds = _loop_fixture(tmp_path, max_steps=2,
                              checkpoint_score="nonsense")
    with pytest.raises(ValueError, match="checkpoint_score"):
        fit(model, ds, run_dir=str(tmp_path / "runx"), max_epochs=1,
            progress=False)

    model, ds = _loop_fixture(tmp_path, max_steps=2,
                              checkpoint_score="epoch_min")
    state = fit(model, ds, run_dir=str(tmp_path / "run2"), max_epochs=1,
                progress=False)
    assert int(np.asarray(state.step)) == 2
    assert (tmp_path / "run2" / "checkpoints" / "last").exists()
