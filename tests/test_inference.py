"""Inference engine tests: tiling semantics, blending parity, end-to-end."""

import os
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from patch_toon_tpu.infer.tiling import (
    bucket_size,
    gaussian_tile_weight,
    pack_boxes,
    tile_boxes_from_mask,
)


def ref_tile_boxes(mask, patch_size, overlap_percent):
    """Numpy replica of reference _get_valid_patch_positions
    (generator.py:353-398)."""
    overlap = min(max(overlap_percent, 0.0), 100.0) / 100.0
    stride = max(1, int(patch_size * (1 - overlap)))
    h, w = mask.shape
    half = patch_size // 2
    ys, xs = np.nonzero(mask)
    out, used = [], set()
    for idx in range(0, len(ys), stride):
        y, x = int(ys[idx]), int(xs[idx])
        key = (y // stride, x // stride)
        if key not in used:
            used.add(key)
            out.append((max(0, y - half), min(h, y + half),
                        max(0, x - half), min(w, x + half)))
    return out


def test_tile_boxes_match_reference(rng):
    mask = (rng.random((120, 200)) > 0.3).astype(np.float32)
    for overlap in (0.0, 30.0, 50.0, 90.0):
        ours = tile_boxes_from_mask(mask, 40, overlap)
        ref = ref_tile_boxes(mask, 40, overlap)
        assert ours == ref, f"overlap={overlap}"


def test_gaussian_weight_matches_torch():
    torch = pytest.importorskip("torch")

    for ph, pw in [(80, 80), (53, 80), (80, 41), (17, 23)]:
        # reference generator.py:527-539
        wy = torch.exp(-((torch.arange(ph) - ph / 2) ** 2 / (ph / 4) ** 2))
        wx = torch.exp(-((torch.arange(pw) - pw / 2) ** 2 / (pw / 4) ** 2))
        ref = (wy[:, None] * wx[None, :])[None, None]
        if (ph, pw) != (80, 80):
            ref = torch.nn.functional.interpolate(
                ref, size=(80, 80), mode="bilinear", align_corners=False)
        got = gaussian_tile_weight(ph, pw, 80)
        np.testing.assert_allclose(got, ref[0, 0].numpy(), atol=1e-5)


def test_bucket_and_pack():
    assert bucket_size(1) == 32
    # 33..128 pads straight to 128: the bf16 B=64 program is ABSOLUTELY
    # slower than B=128 on v5e (28.9 vs 14.3 ms, docs/perf/
    # small_batch_r5.json), so the 64/96 buckets are skipped
    assert bucket_size(33) == 128
    assert bucket_size(64) == 128
    assert bucket_size(128) == 128
    assert bucket_size(200) == 256
    # above 128: next multiple of 128 (measured-good set on v5e), NOT pow2
    # (docs/perf/bucket_sweep_r3.json — less padding, same per-tile rate)
    assert bucket_size(129) == 256
    assert bucket_size(300) == 384
    assert bucket_size(384) == 384
    assert bucket_size(385) == 512
    assert bucket_size(513) == 640
    assert bucket_size(1020) == 1024
    boxes = [(0, 16, 0, 16), (4, 20, 4, 20)]
    pb, wts, n = pack_boxes(boxes, 16, 32)
    assert pb.shape == (32, 4) and wts.shape == (32, 16, 16) and n == 2
    assert wts[2:].sum() == 0  # padding tiles contribute nothing


def test_frame_blend_matches_manual_reference():
    """Our single-jit frame program vs a literal per-tile reference replica
    (center-pad, Gaussian-weighted accumulate, normalize, composite) using
    the same generator."""
    from patch_toon_tpu.infer.engine import make_frame_fn
    from patch_toon_tpu.models import GeneratorJ

    ps = 16
    h, w, c = 40, 56, 3
    gen = GeneratorJ(input_channels=3, use_bias=True, resnet_blocks=1,
                     filters=(4, 8, 8, 8, 8, 4))
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 3)))

    key = jax.random.PRNGKey(1)
    frame = np.asarray(jax.random.uniform(key, (h, w, c))) * 2 - 1
    mask = np.zeros((h, w), np.float32)
    mask[6:34, 8:50] = 1.0

    boxes = tile_boxes_from_mask(mask, ps, 30.0)
    assert len(boxes) > 3
    pb, wts, n = pack_boxes(boxes, ps, bucket_size(len(boxes)))
    fn = make_frame_fn(gen, ps, pb.shape[0], h, w, c, jnp.float32)
    got, _ = fn(g_vars, jnp.asarray(frame), jnp.asarray(pb),
                jnp.asarray(wts), jnp.asarray(mask[..., None]))
    got = np.asarray(got)

    # manual replica (reference generator.py:427-563 semantics)
    out = np.zeros((h, w, 3), np.float32)
    weights = np.zeros((h, w, 1), np.float32)
    for (y0, y1, x0, x1) in boxes:
        ph, pw = y1 - y0, x1 - x0
        raw = frame[y0:y1, x0:x1]
        tile = np.zeros((ps, ps, c), np.float32)
        ho, wo = (ps - ph) // 2, (ps - pw) // 2
        tile[ho:ho + ph, wo:wo + pw] = raw           # center pad
        pred = np.asarray(gen.apply(g_vars, jnp.asarray(tile[None])))[0]
        wt = gaussian_tile_weight(ph, pw, ps)
        hl = min(y0 + ps, h) - y0
        wl = min(x0 + ps, w) - x0
        out[y0:y0 + hl, x0:x0 + wl] += pred[:hl, :wl] * wt[:hl, :wl, None]
        weights[y0:y0 + hl, x0:x0 + wl] += wt[:hl, :wl, None]
    out = out / np.where(weights > 1e-8, weights, 1.0)
    out = frame[:, :, :3] * (1 - mask[..., None]) + out * mask[..., None]
    ref = np.round(np.clip((np.clip(out, -1, 1) + 1) * 127.5, 0, 255)).astype(np.uint8)

    # uint8 rounding can flip by 1 on exact .5 boundaries
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    assert (got != ref).mean() < 0.001


@pytest.fixture()
def synthetic_scene(tmp_path):
    """Two 48x64 keyframes with a masked center region + gen frames."""
    rng = np.random.default_rng(7)
    for split in ("train", "gen"):
        for sub in ("input", "output", "mask"):
            (tmp_path / split / sub).mkdir(parents=True)
    for i in range(2):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        sty = 255 - img  # "style" = invert
        mask = np.zeros((48, 64), np.uint8)
        mask[16:32, 24:44] = 255
        for split in ("train", "gen"):
            Image.fromarray(img).save(tmp_path / split / "input" / f"{i:03d}.png")
            Image.fromarray(mask).save(tmp_path / split / "mask" / f"{i:03d}.png")
        Image.fromarray(sty).save(tmp_path / "train" / "output" / f"{i:03d}.png")
    return tmp_path


def test_end_to_end_train_and_infer(synthetic_scene, tmp_path):
    """Full pipeline: train.py -> checkpoint -> generator.py, tiny scale."""
    import train as train_entry
    import generator as gen_entry
    from patch_toon_tpu.config import compose

    root = pathlib.Path(__file__).resolve().parents[1]
    run_dir = tmp_path / "run"
    base = synthetic_scene

    cfg = compose(root / "config", "config", overrides=[
        f"data.dir_pre={base}/train/input",
        f"data.dir_post={base}/train/output",
        f"data.dir_mask={base}/train/mask",
        "data.patch_size=16",
        "data.additional_channels={}",
        "training.batch_size=32",
        "training.max_epochs=2",
        "training.early_stopping=false",
        "training.devices=1",
        "training.image_log_freq=5",
        "training.log_every_n_steps=2",
        f"training.output_dir={tmp_path}/out",
        f"run.dir={run_dir}",
        "model.generator.args.resnet_blocks=1",
        "model.generator.args.filters=[4,8,8,8,8,4]",
        "model.discriminator.args.num_filters=4",
    ])
    train_entry.train(cfg)

    ckpt = run_dir / "checkpoints" / "last"
    assert ckpt.exists()
    assert (run_dir / "config.yaml").exists()

    icfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={base}/gen/input",
        f"paths.mask_dir={base}/gen/mask",
        f"paths.output_dir={base}/gen/stylized",
        "paths.additional_channels={}",
        "data.patch_size=16",
        "inference.use_gpu=false",
        "inference.precision=32",
        "model.generator.args.resnet_blocks=1",
        "model.generator.args.filters=[4,8,8,8,8,4]",
    ])
    from patch_toon_tpu.infer import StyleTransferInference

    eng = StyleTransferInference(icfg)
    eng.process_directory()

    outs = sorted((base / "gen" / "stylized").glob("*.png"))
    assert len(outs) == 2
    out = np.asarray(Image.open(outs[0]))
    inp = np.asarray(Image.open(base / "gen" / "input" / "000.png"))
    assert out.shape == inp.shape
    mask = np.asarray(Image.open(base / "gen" / "mask" / "000.png")) > 128
    # outside the mask the frame must be untouched (composite semantics)
    assert np.array_equal(out[~mask], inp[~mask])
    # inside the (eroded) mask it must be stylized
    inner = np.zeros_like(mask)
    inner[16 + 4:32 - 4, 24 + 4:44 - 4] = True
    assert np.abs(out[inner].astype(int) - inp[inner].astype(int)).mean() > 2


def test_fullframe_mode(synthetic_scene, tmp_path):
    """The one-pass fullframe fast path: same composite semantics outside
    the mask, stylized inside, correct shapes at non-multiple-of-4 sizes."""
    from patch_toon_tpu.infer.engine import make_fullframe_fn
    from patch_toon_tpu.models import GeneratorJ

    h, w, c = 46, 63, 3  # deliberately not divisible by 4
    gen = GeneratorJ(input_channels=3, use_bias=True, resnet_blocks=1,
                     filters=(4, 8, 8, 8, 8, 4))
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    frame = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1), (h, w, c))) * 2 - 1
    mask = np.zeros((h, w, 1), np.float32)
    mask[10:36, 12:50] = 1.0

    fn = make_fullframe_fn(gen, h, w, c, jnp.float32)
    out_u8, out_float = fn(g_vars, jnp.asarray(frame), jnp.asarray(mask))
    out = np.asarray(out_u8)
    assert out_float.shape == (h, w, 3) and out_float.dtype == jnp.float32
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    ref_outside = np.round(
        np.clip((np.clip(frame, -1, 1) + 1) * 127.5, 0, 255)).astype(np.uint8)
    m = mask[..., 0] > 0
    np.testing.assert_array_equal(out[~m], ref_outside[~m])
    assert np.abs(out[m].astype(int) - ref_outside[m].astype(int)).mean() > 1


def test_multiframe_matches_single_frame():
    """The co-batched multiframe program must produce identical frames to
    the single-frame tiled program."""
    from patch_toon_tpu.infer.engine import make_frame_fn, make_multiframe_fn
    from patch_toon_tpu.infer.tiling import pack_boxes_multi
    from patch_toon_tpu.models import GeneratorJ

    ps, h, w, c = 16, 40, 56, 3
    gen = GeneratorJ(input_channels=3, use_bias=True, resnet_blocks=1,
                     filters=(4, 8, 8, 8, 8, 4))
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 3)))

    rng = np.random.default_rng(2)
    frames = [rng.random((h, w, c)).astype(np.float32) * 2 - 1
              for _ in range(3)]
    mask = np.zeros((h, w), np.float32)
    mask[6:34, 8:50] = 1.0
    boxes = tile_boxes_from_mask(mask, ps, 30.0)
    group_boxes = [boxes] * 3

    total = 3 * len(boxes)
    mbucket = bucket_size(total)
    fb, wts, _ = pack_boxes_multi(group_boxes, ps, mbucket)
    mfn = make_multiframe_fn(gen, ps, mbucket, 3, h, w, c, jnp.float32)
    got_u8, got_f = mfn(g_vars, jnp.asarray(np.stack(frames)),
                        jnp.asarray(fb), jnp.asarray(wts),
                        jnp.asarray(np.stack([mask] * 3))[..., None])
    got_u8 = np.asarray(got_u8)

    sbucket = bucket_size(len(boxes))
    pb, swts, _ = pack_boxes(boxes, ps, sbucket)
    sfn = make_frame_fn(gen, ps, sbucket, h, w, c, jnp.float32)
    for k in range(3):
        ref_u8, _ = sfn(g_vars, jnp.asarray(frames[k]), jnp.asarray(pb),
                        jnp.asarray(swts), jnp.asarray(mask[..., None]))
        assert np.abs(got_u8[k].astype(int)
                      - np.asarray(ref_u8).astype(int)).max() <= 1


def test_engine_groups_frames(synthetic_scene, tmp_path):
    """process_directory with frames_per_dispatch=2 must equal =1 output."""
    import train as train_entry
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    root = pathlib.Path(__file__).resolve().parents[1]
    run_dir = tmp_path / "run"
    base = synthetic_scene
    cfg = compose(root / "config", "config", overrides=[
        f"data.dir_pre={base}/train/input",
        f"data.dir_post={base}/train/output",
        f"data.dir_mask={base}/train/mask",
        "data.patch_size=16", "data.additional_channels={}",
        "training.batch_size=16", "training.max_epochs=1",
        "+training.max_steps=5",
        "training.early_stopping=false", "training.image_log_freq=1000",
        f"training.output_dir={tmp_path}/out", f"run.dir={run_dir}",
        "model.generator.args.resnet_blocks=1",
        "model.generator.args.filters=[4,8,8,8,8,4]",
        "model.discriminator.args.num_filters=4",
    ])
    train_entry.train(cfg)

    outs = {}
    for fpd in (1, 2):
        icfg = compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={run_dir}/checkpoints/last",
            f"paths.input_dir={base}/gen/input",
            f"paths.mask_dir={base}/gen/mask",
            f"paths.output_dir={base}/gen/stylized_fpd{fpd}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            "inference.precision=32",
            f"+inference.frames_per_dispatch={fpd}",
            "model.generator.args.resnet_blocks=1",
            "model.generator.args.filters=[4,8,8,8,8,4]",
        ])
        StyleTransferInference(icfg).process_directory()
        outs[fpd] = [np.asarray(Image.open(p)) for p in
                     sorted((base / "gen" / f"stylized_fpd{fpd}").glob("*.png"))]
    assert len(outs[1]) == len(outs[2]) == 2
    for a, b in zip(outs[1], outs[2]):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_crop_readback_byte_identical(tmp_path):
    """crop_readback fetches only the stylized bbox and reconstructs the
    frame from the input bytes — outputs must be byte-identical to the
    full-readback run (and the crop path must actually engage)."""
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference
    from patch_toon_tpu.train import StyleTransferModel
    from patch_toon_tpu.train.checkpoints import CheckpointManager

    rng = np.random.default_rng(5)
    scene = tmp_path / "scene"
    for sub in ("input", "mask"):
        (scene / sub).mkdir(parents=True)
    h, w = 160, 256
    mask = np.zeros((h, w), np.uint8)
    mask[40:80, 64:128] = 255  # small mask: bbox well under the 85% cutoff
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
    for crop in ("auto", "off"):
        icfg = compose(root / "config", "inference", overrides=[
            f"paths.checkpoint={tmp_path}/ckpt/last",
            f"paths.input_dir={scene}/input",
            f"paths.mask_dir={scene}/mask",
            f"paths.output_dir={tmp_path}/styl_{crop}",
            "paths.additional_channels={}",
            "data.patch_size=16", "inference.use_gpu=false",
            "inference.precision=32",
            f"inference.crop_readback={crop}",
        ])
        engines[crop] = StyleTransferInference(icfg)
        engines[crop].process_directory()

    assert engines["auto"]._last_crop is not None  # crop actually engaged
    assert engines["off"]._last_crop is None
    a = sorted((tmp_path / "styl_auto").glob("*.png"))
    b = sorted((tmp_path / "styl_off").glob("*.png"))
    assert len(a) == len(b) == 3
    for pa, pb in zip(a, b):
        ia = np.asarray(Image.open(pa))
        ib = np.asarray(Image.open(pb))
        assert np.array_equal(ia, ib), pa.name
        # outside the mask both must equal the input bytes exactly
        inp = np.asarray(Image.open(scene / "input" / pa.name))
        sel = mask == 0
        assert np.array_equal(ia[sel], inp[sel]), pa.name

    # pod path (frames sharded over 8 devices) with the cropped fetch must
    # also match, within the pod-batching roundoff bound
    icfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={tmp_path}/ckpt/last",
        f"paths.input_dir={scene}/input",
        f"paths.mask_dir={scene}/mask",
        f"paths.output_dir={tmp_path}/styl_pod",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "inference.precision=32",
        "inference.devices=8",
    ])
    eng_pod = StyleTransferInference(icfg)
    eng_pod.process_directory()
    assert eng_pod._last_crop is not None  # crop engaged on the pod fetch
    for pa in a:
        ia = np.asarray(Image.open(pa)).astype(int)
        ip = np.asarray(Image.open(
            tmp_path / "styl_pod" / pa.name)).astype(int)
        assert np.abs(ia - ip).max() <= 1, pa.name


def test_watch_mode_serves_new_frames(tmp_path):
    """inference.watch: frames added while the service runs are picked up
    and stylized without reloading the model; idle timeout stops it."""
    import threading
    import time

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference
    from patch_toon_tpu.train import StyleTransferModel
    from patch_toon_tpu.train.checkpoints import CheckpointManager

    rng = np.random.default_rng(9)
    scene = tmp_path / "scene"
    for sub in ("input", "mask"):
        (scene / sub).mkdir(parents=True)
    mask = np.zeros((48, 64), np.uint8)
    mask[12:36, 20:44] = 255

    def add_frame(i):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(scene / "input" / f"{i:03d}.png")
        Image.fromarray(mask).save(scene / "mask" / f"{i:03d}.png")

    add_frame(0)
    add_frame(1)

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
    icfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={tmp_path}/ckpt/last",
        f"paths.input_dir={scene}/input",
        f"paths.mask_dir={scene}/mask",
        f"paths.output_dir={tmp_path}/styl",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "inference.precision=32",
        "inference.watch.enabled=true",
        "inference.watch.poll_seconds=0.3",
        "inference.watch.idle_timeout_seconds=45",
    ])
    eng = StyleTransferInference(icfg)
    t = threading.Thread(target=eng.watch_directory)
    t.start()
    try:
        # wait for the first batch to be served
        deadline = time.time() + 120
        while time.time() < deadline and not (
                (tmp_path / "styl" / "000.png").exists()
                and (tmp_path / "styl" / "001.png").exists()):
            time.sleep(0.5)
        assert (tmp_path / "styl" / "001.png").exists(), "initial frames"
        add_frame(2)  # arrives while the service is running
        deadline = time.time() + 60
        while time.time() < deadline and not (
                tmp_path / "styl" / "002.png").exists():
            time.sleep(0.5)
        assert (tmp_path / "styl" / "002.png").exists(), "late frame"
    finally:
        t.join(timeout=120)  # idle timeout must stop the thread
    assert not t.is_alive()

    # outputs identical to a one-shot run over the same directory
    icfg2 = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={tmp_path}/ckpt/last",
        f"paths.input_dir={scene}/input",
        f"paths.mask_dir={scene}/mask",
        f"paths.output_dir={tmp_path}/styl_once",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "inference.precision=32",
    ])
    StyleTransferInference(icfg2).process_directory()
    for n in ("000.png", "001.png", "002.png"):
        a = np.asarray(Image.open(tmp_path / "styl" / n))
        b = np.asarray(Image.open(tmp_path / "styl_once" / n))
        assert np.array_equal(a, b), n


def test_watch_mode_gives_up_on_bad_frame(tmp_path):
    """A frame that persistently fails (missing mask) must be retried
    max_attempts times, then dropped — the watcher goes idle and exits by
    timeout instead of spinning."""
    import threading
    import time

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference
    from patch_toon_tpu.train import StyleTransferModel
    from patch_toon_tpu.train.checkpoints import CheckpointManager

    rng = np.random.default_rng(11)
    scene = tmp_path / "scene"
    for sub in ("input", "mask"):
        (scene / sub).mkdir(parents=True)
    mask = np.zeros((48, 64), np.uint8)
    mask[12:36, 20:44] = 255
    for i in range(2):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(scene / "input" / f"{i:03d}.png")
        if i == 0:  # frame 001 has NO mask -> per-file failure every pass
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
    icfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={tmp_path}/ckpt/last",
        f"paths.input_dir={scene}/input",
        f"paths.mask_dir={scene}/mask",
        f"paths.output_dir={tmp_path}/styl",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "inference.precision=32",
        "inference.watch.enabled=true",
        "inference.watch.poll_seconds=0.2",
        "inference.watch.idle_timeout_seconds=8",
        "+inference.watch.max_attempts=3",
    ])
    eng = StyleTransferInference(icfg)
    t = threading.Thread(target=eng.watch_directory)
    t0 = time.time()
    t.start()
    t.join(timeout=180)  # must terminate via idle timeout, not spin
    assert not t.is_alive(), "watcher failed to go idle after giving up"
    assert (tmp_path / "styl" / "000.png").exists()  # good frame served
    assert not (tmp_path / "styl" / "001.png").exists()  # bad one dropped
    assert time.time() - t0 < 175


def _crop_upload_setup(tmp_path, h=160, w=256, n=3, moving=False):
    """Scene + tiny checkpoint for the crop-upload tests."""
    from patch_toon_tpu.train import StyleTransferModel
    from patch_toon_tpu.train.checkpoints import CheckpointManager

    rng = np.random.default_rng(7)
    scene = tmp_path / "scene"
    for sub in ("input", "mask"):
        (scene / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        dx = 16 * i if moving else 0
        mask[40:80, 64 + dx:128 + dx] = 255
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
    return scene


def _run_crop_upload(tmp_path, scene, tag, overrides):
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer import StyleTransferInference

    root = pathlib.Path(__file__).resolve().parents[1]
    icfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={tmp_path}/ckpt/last",
        f"paths.input_dir={scene}/input",
        f"paths.mask_dir={scene}/mask",
        f"paths.output_dir={tmp_path}/styl_{tag}",
        "paths.additional_channels={}",
        "data.patch_size=16", "inference.use_gpu=false",
        "inference.precision=32",
        *overrides,
    ])
    eng = StyleTransferInference(icfg)
    eng.process_directory()
    return eng


@pytest.mark.parametrize("extra", [[], ["inference.devices=8"]])
def test_crop_upload_byte_identical(tmp_path, extra):
    """crop_upload crops frame+mask to the bucketed tile read-union window
    BEFORE upload and runs the program on the window — outputs must be
    byte-identical to the full-frame dispatch (single-host and pod)."""
    scene = _crop_upload_setup(tmp_path)
    tagbase = f"d{len(extra)}"
    engines = {}
    for cu in ("auto", "off"):
        engines[cu] = _run_crop_upload(
            tmp_path, scene, f"{tagbase}_{cu}",
            [f"inference.crop_upload={cu}",
             *([] if cu == "auto" else ["inference.crop_readback=off"]),
             *extra])
    # the window engaged, and it is SMALLER than the frame
    win = engines["auto"]._last_crop
    assert win is not None
    y0, y1, x0, x1 = win
    assert (y1 - y0) * (x1 - x0) < 160 * 256
    a = sorted((tmp_path / f"styl_{tagbase}_auto").glob("*.png"))
    b = sorted((tmp_path / f"styl_{tagbase}_off").glob("*.png"))
    assert len(a) == len(b) == 3
    for pa, pb in zip(a, b):
        assert np.array_equal(np.asarray(Image.open(pa)),
                              np.asarray(Image.open(pb))), pa.name


def test_crop_upload_moving_mask_flushes_groups(tmp_path):
    """A mask that drifts across frames may change the bucketed window
    ORIGIN (same shape: no recompile, groups co-batch) — and a shape
    change flushes the in-progress group instead of mixing shapes.
    Outputs stay byte-identical to the uncropped run either way."""
    scene = _crop_upload_setup(tmp_path, n=4, moving=True)
    for cu in ("auto", "off"):
        _run_crop_upload(
            tmp_path, scene, f"mv_{cu}",
            [f"inference.crop_upload={cu}",
             *([] if cu == "auto" else ["inference.crop_readback=off"]),
             "+inference.frames_per_dispatch=2"])
    a = sorted((tmp_path / "styl_mv_auto").glob("*.png"))
    b = sorted((tmp_path / "styl_mv_off").glob("*.png"))
    assert len(a) == len(b) == 4
    for pa, pb in zip(a, b):
        assert np.array_equal(np.asarray(Image.open(pa)),
                              np.asarray(Image.open(pb))), pa.name


def test_crop_upload_speckle_mask_byte_identical(tmp_path):
    """An eroded-mask pixel that the stride-sampled tile walk SKIPS (no
    tile covers it) must still land inside the upload window: under the
    full-frame dispatch it composites the zero blend canvas (uint8 gray),
    and a window that excluded it would paste input bytes there instead —
    the exact bit-parity hole the mask-support union closes (review r3).

    Construction: blob A erodes to 34x58 = 1972 pixels; blob B is a 7x7
    square whose single full-support survivor (350,350) gets eroded-list
    index 1972 (1972 % 11 != 0, so the stride-11 walk skips it) and sits
    ~270 px from every blob-A tile."""
    from patch_toon_tpu.train import StyleTransferModel
    from patch_toon_tpu.train.checkpoints import CheckpointManager
    from patch_toon_tpu.ops.masks import erode_full_support_np

    h, w = 384, 640
    rng = np.random.default_rng(11)
    scene = tmp_path / "scene"
    for sub in ("input", "mask"):
        (scene / sub).mkdir(parents=True, exist_ok=True)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[40:80, 40:104] = 255       # blob A: erodes to [43:77, 43:101]
    mask[347:354, 347:354] = 255    # blob B: erodes to the single (350,350)
    Image.fromarray(img).save(scene / "input" / "000.png")
    Image.fromarray(mask).save(scene / "mask" / "000.png")
    # the survivor really is in the composite mask but got no tile
    # (engine semantics: tiles walk the ERODED mask's nonzero list)
    from patch_toon_tpu.infer.tiling import tile_boxes_from_mask
    eroded = erode_full_support_np((mask > 128).astype(np.float32))
    assert eroded[350, 350] == 1.0
    boxes = tile_boxes_from_mask(eroded, 16, 30.0)
    assert not any(b[0] <= 350 < b[1] and b[2] <= 350 < b[3]
                   for b in boxes)

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
              "patch_size": 16}).save(state, epoch=0, score=1.0)

    engines = {}
    for cu in ("auto", "off"):
        engines[cu] = _run_crop_upload(
            tmp_path, scene, f"sp_{cu}",
            [f"inference.crop_upload={cu}",
             *([] if cu == "auto" else ["inference.crop_readback=off"])])
    win = engines["auto"]._last_crop
    if win is not None:  # window engaged: must be smaller than the frame
        y0, y1, x0, x1 = win
        assert (y1 - y0) * (x1 - x0) < h * w
    a = np.asarray(Image.open(tmp_path / "styl_sp_auto" / "000.png"))
    b = np.asarray(Image.open(tmp_path / "styl_sp_off" / "000.png"))
    assert np.array_equal(a, b)
    # and the speckle pixel really is gray-composited, i.e. the case is live
    assert not np.array_equal(b[350, 350], img[350, 350])


def test_crop_upload_window_covers_all_reads():
    """upload_crop_window must cover the exact gather read union (centered
    short boxes included) so the cropped dispatch is bit-identical."""
    from patch_toon_tpu.infer.engine import upload_crop_window

    ps = 16
    # a short 4x6 box at (40, 64): gather reads the centered 16x16 window
    boxes = [(40, 44, 64, 70)]
    win = upload_crop_window(boxes, 160, 256, ps, bucket=8, full_frac=1.0)
    y0, y1, x0, x1 = win
    hoff = (ps - 4) // 2
    woff = (ps - 6) // 2
    assert y0 <= 40 - hoff and y1 >= 40 - hoff + ps
    assert x0 <= 64 - woff and x1 >= 64 - woff + ps
    # empty box list / near-full coverage -> no crop
    assert upload_crop_window([], 160, 256, ps) is None
    full = [(y, y + ps, x, x + ps)
            for y in range(0, 160, ps) for x in range(0, 256, ps)]
    assert upload_crop_window(full, 160, 256, ps) is None
