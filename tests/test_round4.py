"""Round-4 additions: batched temporal flows (VERDICT r3 #1), watch-loop
resilience (ADVICE r3), and chain-step helper behavior."""

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


def _rand_frames(rng, n, h, w, c=3):
    return [(rng.random((h, w, c)) * 255).astype(np.uint8)
            for _ in range(n)]


def test_flow_window_matches_per_frame():
    """_temporal_flow_window (one vmapped dispatch for a K-frame lookahead)
    must reproduce the per-frame _temporal_device_flow chain BITWISE —
    flows and grays — including mixed masked/maskless members (a missing
    mask rides an all-ones plane; flow * 1.0 is exact)."""
    from patch_toon_tpu.infer.temporal import (
        _device_gray,
        _packed_ones_mask,
        _temporal_device_flow,
        _temporal_flow_window,
    )

    rng = np.random.default_rng(5)
    h, w = 40, 56
    frames = _rand_frames(rng, 5, h, w)
    mask = (rng.random((h, w)) > 0.3).astype(np.uint8)
    packed = np.packbits(mask.reshape(-1))
    # per-frame chain: frame 0 bootstrap, flows for 1..4; frame 2 maskless
    auxs = [packed, None, packed, packed]
    prev_gray = _device_gray(jnp.asarray(frames[0]))
    flows_ref, grays_ref = [], []
    pg = prev_gray
    for t in range(4):
        fmask = None if auxs[t] is None else jnp.asarray(auxs[t])
        fl, gr = _temporal_device_flow(jnp.asarray(frames[t + 1]), pg,
                                       fmask, 1)
        flows_ref.append(np.asarray(fl))
        grays_ref.append(np.asarray(gr))
        pg = gr
    ones = _packed_ones_mask(h, w)
    fmasks = jnp.asarray(np.stack(
        [ones if a is None else a for a in auxs]))
    flows, grays = _temporal_flow_window(
        jnp.asarray(np.stack(frames[1:])), prev_gray, fmasks, 1)
    np.testing.assert_array_equal(np.asarray(grays), np.stack(grays_ref))
    np.testing.assert_array_equal(np.asarray(flows), np.stack(flows_ref))


def test_flow_pairs_matches_per_pair():
    """_temporal_flow_pairs (multi-stream cycle co-batch) == per-pair
    _temporal_device_flow, bitwise, at flow_scale 1 and 2."""
    from patch_toon_tpu.infer.temporal import (
        _device_gray,
        _temporal_device_flow,
        _temporal_flow_pairs,
    )

    rng = np.random.default_rng(9)
    h, w = 40, 56
    cur = _rand_frames(rng, 3, h, w)
    prev = _rand_frames(rng, 3, h, w)
    prev_grays = [np.asarray(_device_gray(jnp.asarray(p))) for p in prev]
    for scale in (1, 2):
        ref_flows, ref_grays = [], []
        for k in range(3):
            fl, gr = _temporal_device_flow(
                jnp.asarray(cur[k]), jnp.asarray(prev_grays[k]),
                None, scale)
            ref_flows.append(np.asarray(fl))
            ref_grays.append(np.asarray(gr))
        flows, grays = _temporal_flow_pairs(
            jnp.asarray(np.stack(cur)),
            jnp.asarray(np.stack(prev_grays)), None, scale)
        np.testing.assert_array_equal(np.asarray(grays),
                                      np.stack(ref_grays))
        np.testing.assert_array_equal(np.asarray(flows),
                                      np.stack(ref_flows))


@pytest.fixture()
def device_scene(tmp_path):
    """5-frame scene + a tiny temporal checkpoint for device-flow serving."""
    from patch_toon_tpu.train.checkpoints import CheckpointManager
    from patch_toon_tpu.train.model import StyleTransferModel

    rng = np.random.default_rng(3)
    base = tmp_path / "scene"
    for sub in ("input", "mask"):
        (base / sub).mkdir(parents=True)
    bg = (rng.random((48, 64, 3)) * 160).astype(np.uint8)
    for i in range(5):
        frame = bg.copy()
        x0 = 6 + 5 * i
        frame[16:32, x0:x0 + 14] = (rng.random(3) * 100 + 155).astype(
            np.uint8)
        Image.fromarray(frame).save(base / "input" / f"{i:03d}.png")
        Image.fromarray(np.full((48, 64), 255, np.uint8)).save(
            base / "mask" / f"{i:03d}.jpg")
    g_args = dict(input_channels=6, use_bias=True, tanh=True,
                  append_smoothers=True, resnet_blocks=1,
                  filters=[4, 8, 8, 8, 8, 4],
                  norm_layer="instance_norm")
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
    return base, tmp_path / "ckpt" / "last"


def _serve(ckpt, base, out_dir, extra):
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={base}/input",
        f"paths.mask_dir={base}/mask",
        f"paths.output_dir={out_dir}",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "+inference.temporal.enabled=true",
        "+inference.temporal.flow_source=device",
        "+inference.temporal.depth=3",
    ] + extra)
    eng = StyleTransferInference(cfg)
    eng.process_directory()
    return eng


def test_flow_batch_e2e_byte_parity(device_scene, tmp_path):
    """flow_batch=3 (lookahead window) serves byte-identical frames to
    flow_batch=1 (per-frame dispatches) — flows are input-only, batching
    computes the same values earlier."""
    base, ckpt = device_scene
    eng1 = _serve(ckpt, base, tmp_path / "fb1",
                  ["+inference.temporal.flow_batch=1"])
    assert eng1.temporal_flow_batch == 1
    eng3 = _serve(ckpt, base, tmp_path / "fb3",
                  ["+inference.temporal.flow_batch=3"])
    assert eng3.temporal_flow_batch == 3
    for i in range(5):
        a = np.asarray(Image.open(tmp_path / "fb1" / f"{i:03d}.png"))
        b = np.asarray(Image.open(tmp_path / "fb3" / f"{i:03d}.png"))
        np.testing.assert_array_equal(a, b, err_msg=f"{i:03d}.png")


def test_flow_batch_knob_validation():
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = compose(root / "config", "inference", overrides=[
        "+inference.temporal.flow_batch=99",
    ])
    with pytest.raises(ValueError, match="flow_batch"):
        StyleTransferInference(cfg)


def test_image_files_missing_dir_returns_empty(tmp_path):
    """ADVICE r3 (medium): a deleted directory must read as empty — the
    watch loops call _image_files every poll and must not crash when a
    stream subdirectory (or the input dir) disappears mid-watch."""
    from patch_toon_tpu.infer.engine import _image_files

    assert _image_files(tmp_path / "nope") == []
    f = tmp_path / "afile.txt"
    f.write_text("x")
    assert _image_files(f) == []  # not a directory


def test_detect_streams_missing_dir(tmp_path):
    from patch_toon_tpu.infer.engine import StyleTransferInference

    eng = StyleTransferInference.__new__(StyleTransferInference)
    assert eng._detect_streams(tmp_path / "gone") == []


def _age_files(d):
    """Back-date mtimes so watch's settle check picks files up at once."""
    import os
    import time as _t

    old = _t.time() - 60
    for p in pathlib.Path(d).rglob("*"):
        if p.is_file():
            os.utime(p, (old, old))


def test_process_directory_interrupt_flushes(device_scene, tmp_path):
    """VERDICT r3 #8: an interrupt mid-stream must not drop in-flight
    frames — every frame dispatched before the interrupt reaches disk
    (readback drained + writer queue flushed in the finally)."""
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    base, ckpt = device_scene
    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={base}/input",
        f"paths.mask_dir={base}/mask",
        f"paths.output_dir={tmp_path}/out",
        f"paths.additional_channels={{chan: {{path: {base}/input, depth: 3}}}}",
        "data.patch_size=16", "inference.use_gpu=false",
        "+inference.frames_per_dispatch=1",
    ])
    eng = StyleTransferInference(cfg)
    orig = eng._load_frame

    def boom(path, **kw):
        if "003" in str(path):
            raise KeyboardInterrupt
        return orig(path, **kw)

    eng._load_frame = boom
    with pytest.raises(KeyboardInterrupt):
        eng.process_directory(progress=False)
    outs = sorted(p.name for p in (tmp_path / "out").glob("*.png"))
    assert outs == ["000.png", "001.png", "002.png"], outs


def test_watch_interrupt_graceful(device_scene, tmp_path, monkeypatch):
    """VERDICT r3 #8: Ctrl-C/SIGTERM during a temporal watch returns
    cleanly (no exception out of watch_directory) with every processed
    frame flushed to disk."""
    import time as _t

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    base, ckpt = device_scene
    _age_files(base)
    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={base}/input",
        f"paths.mask_dir={base}/mask",
        f"paths.output_dir={tmp_path}/out",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "+inference.temporal.enabled=true",
        "+inference.temporal.flow_source=device",
        "+inference.temporal.depth=3",
    ])
    eng = StyleTransferInference(cfg)

    def fake_sleep(s):
        raise KeyboardInterrupt

    monkeypatch.setattr(_t, "sleep", fake_sleep)
    eng.watch_directory()  # must return, not raise
    outs = sorted(p.name for p in (tmp_path / "out").glob("*.png"))
    assert len(outs) == 5, outs


def test_watch_multistream_interrupt_graceful(device_scene, tmp_path,
                                              monkeypatch):
    """Multi-stream watch: same graceful-shutdown contract."""
    import shutil
    import time as _t

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    base, ckpt = device_scene
    ms = tmp_path / "streams"
    for s in ("a", "b"):
        shutil.copytree(base / "input", ms / "input" / s)
        shutil.copytree(base / "mask", ms / "mask" / s)
    _age_files(ms)
    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={ms}/input",
        f"paths.mask_dir={ms}/mask",
        f"paths.output_dir={tmp_path}/out",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "+inference.temporal.enabled=true",
        "+inference.temporal.flow_source=device",
        "+inference.temporal.depth=3",
    ])
    eng = StyleTransferInference(cfg)

    def fake_sleep(s):
        raise KeyboardInterrupt

    monkeypatch.setattr(_t, "sleep", fake_sleep)
    eng.watch_directory()  # routes to _watch_multistream; must return
    for s in ("a", "b"):
        outs = sorted(p.name for p in (tmp_path / "out" / s).glob("*.png"))
        assert len(outs) == 5, (s, outs)
