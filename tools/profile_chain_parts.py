#!/usr/bin/env python
"""Attribute ONE temporal chain step's device time, dispatch by dispatch
(VERDICT r4 #3: temporal compute-only measured 20.1 fps = 49.7 ms/frame at
fs1, but prologue 18.5 ms + "170 tiles x 110 us" ~= 37 ms left ~12 ms/frame
unexplained).

Hypothesis under test: the missing time is TILE-BUCKET PADDING — the chain
is inherently sequential (fpd=1), so a 170-tile 512x910 frame rides a
256-tile bucket (bucket_size: pow2 to 128 then ceil-to-128-multiple) and
the generator dispatch costs ~256 x ~110 us ~= 28 ms, not 170 x 110.

Components timed (dispatch-difference, median-of-3, device-slice sync —
bench.py's estimator; never block_until_ready through the axon tunnel):

  upload        jnp.asarray of the uint8 RGB frame (H2D on the chain's
                critical path)
  flow_s1/s2    _temporal_device_flow (pil_gray + pyramidal LK + zeroing)
  prep          _temporal_prep (normalize + warp_image + guide concat)
  gen_b256      the tiled frame program at the shipped bucket (170 real
                tiles -> bucket 256)
  gen_split     the same 170 tiles through a (128, 64)-chunked generator
                inside ONE program (192 tile-slots; candidate fix)
  gen_b128/64   full-occupancy reference points for the chunk sizes
  whole_fs1/2   the engine's real _chain_step in a loop (the number the
                components must sum to)

Writes docs/perf/chain_parts_r5.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

H, W, PS, C = 512, 910, 80, 6


def med_diff_ms(run, n: int = 12, reps: int = 3) -> float:
    """Median over reps of (T(2n) - T(n)) / n, in ms per unit."""
    vals = []
    for _ in range(reps):
        a = run(n)
        b = run(2 * n)
        vals.append((b - a) / n * 1e3)
    return float(np.median(vals))


def main() -> None:
    import tempfile

    import jax
    import jax.numpy as jnp

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer.engine import (
        StyleTransferInference,
        make_frame_fn,
    )
    from patch_toon_tpu.infer.temporal import (
        _device_gray,
        _temporal_device_flow,
        _temporal_prep,
    )
    from patch_toon_tpu.infer.tiling import (
        bucket_size,
        pack_boxes,
        tile_boxes_from_mask,
    )
    from patch_toon_tpu.models import GeneratorJ
    from patch_toon_tpu.train.checkpoints import CheckpointManager
    from patch_toon_tpu.train.model import StyleTransferModel
    from patch_toon_tpu.utils.cache import enable_compilation_cache
    from patch_toon_tpu.utils.xla_options import resolve_xla_options

    enable_compilation_cache()
    xla_opts = resolve_xla_options("auto")
    rng = np.random.default_rng(0)
    results: dict = {"h": H, "w": W, "ps": PS}

    hosts = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
             for _ in range(3)]
    ones = np.ones((H, W), np.float32)
    boxes = tile_boxes_from_mask(ones, PS, 30.0)
    results["tiles"] = len(boxes)
    results["bucket"] = bucket_size(len(boxes))

    # ---- component: upload -------------------------------------------
    def t_upload(n):
        t0 = time.perf_counter()
        a = None
        for i in range(n):
            # touch a DIFFERENT host buffer each dispatch so jax can't
            # dedupe; sync each upload through a 1-px round trip
            a = jnp.asarray(hosts[i % 3])
        np.asarray(a[0, 0, 0])
        return time.perf_counter() - t0

    t_upload(2)
    results["upload_ms"] = med_diff_ms(t_upload)

    # ---- components: flow + prep --------------------------------------
    fdevs = [jax.device_put(f) for f in hosts]
    gray0 = _device_gray(fdevs[0])
    np.asarray(gray0[0, 0])

    for scale in (1, 2):
        def t_flow(n, scale=scale):
            t0 = time.perf_counter()
            fl = None
            for i in range(n):
                fl, _ = _temporal_device_flow(fdevs[i % 3], gray0, None,
                                              scale)
            np.asarray(fl[0, 0, 0])
            return time.perf_counter() - t0

        t_flow(2)
        results[f"flow_s{scale}_ms"] = med_diff_ms(t_flow)

    prev = jnp.zeros((H, W, 3), jnp.float32)
    flow0, _ = _temporal_device_flow(fdevs[0], gray0, None, 1)

    def t_prep(n):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = _temporal_prep(fdevs[i % 3], prev, flow0, 3)
        np.asarray(o[0, 0, 0])
        return time.perf_counter() - t0

    t_prep(2)
    results["prep_ms"] = med_diff_ms(t_prep)

    # ---- component: the tiled generator program ------------------------
    gen = GeneratorJ(input_channels=C, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64),
                     dtype=jnp.bfloat16)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))
    full6 = [jnp.asarray(rng.random((H, W, C), np.float32) * 2 - 1)
             for _ in range(3)]
    mask_j = jnp.asarray(ones)[..., None]

    def time_tile_prog(fn, pb, wts, tag):
        pb_j, wts_j = jnp.asarray(pb), jnp.asarray(wts)
        for i in range(3):
            np.asarray(fn(g_vars, full6[i % 3], pb_j, wts_j, mask_j)[0])

        def t(n):
            t0 = time.perf_counter()
            o = None
            for i in range(n):
                o = fn(g_vars, full6[i % 3], pb_j, wts_j, mask_j)
            np.asarray(o[0][0, 0, 0])
            return time.perf_counter() - t0

        ms = med_diff_ms(t)
        results[tag] = round(ms, 3)
        print(f"[chain_parts] {tag}: {ms:.2f} ms", file=sys.stderr)
        return ms

    bucket = bucket_size(len(boxes))
    pb, wts, _ = pack_boxes(boxes, PS, bucket)
    fn256 = make_frame_fn(gen, PS, bucket, H, W, C, jnp.bfloat16,
                          compiler_options=xla_opts)
    time_tile_prog(fn256, pb, wts, f"gen_b{bucket}_ms")

    # split-chunk candidate: same 170 boxes, 192 slots, generator applied
    # as two chunks (128 + 64) inside one program
    from patch_toon_tpu.infer.programs import _frame_body

    def make_split_fn(chunks):
        # honest prototype: same _frame_body, generator call site applied
        # chunk by chunk (static slices) and re-concatenated
        class _ChunkGen:
            def apply(self, g_vars_, tiles, train=False):
                outs, i = [], 0
                for ch in chunks:
                    outs.append(gen.apply(g_vars_, tiles[i:i + ch],
                                          train=train))
                    i += ch
                return jnp.concatenate(outs, axis=0)

        body = _frame_body(_ChunkGen(), PS, sum(chunks), H, W, C,
                           jnp.bfloat16)
        return jax.jit(body, compiler_options=xla_opts)

    pb192, wts192, _ = pack_boxes(boxes, PS, 192)
    time_tile_prog(make_split_fn((128, 64)), pb192, wts192,
                   "gen_split_128_64_ms")

    # full-occupancy reference points for the chunk sizes
    for b in (128, 64):
        pbb, wtsb, _ = pack_boxes(boxes[:b], PS, b)
        fnb = make_frame_fn(gen, PS, b, H, W, C, jnp.bfloat16,
                            compiler_options=xla_opts)
        time_tile_prog(fnb, pbb, wtsb, f"gen_b{b}_full_ms")

    # ---- whole step: the engine's real _chain_step ---------------------
    tmp = Path(tempfile.mkdtemp(prefix="chain_parts_"))
    g_args = dict(input_channels=6, use_bias=True, tanh=True,
                  append_smoothers=True, resnet_blocks=7,
                  filters=[32, 64, 128, 128, 128, 64],
                  norm_layer="instance_norm")
    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(g_args)},
        discriminator_config=None,
        training_config=dict(batch_size=4, precision="bf16"),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5)),
        data_config=dict(patch_size=PS, additional_channels={}),
        perception_loss_config=None)
    state = model.init_state(jax.random.PRNGKey(0), patch_size=PS)
    CheckpointManager(
        tmp / "ckpt", meta={"input_channels": 6, "generator_args": g_args,
                            "patch_size": PS}).save(state, epoch=0, score=1.0)
    (tmp / "out").mkdir()

    for scale in (1, 2):
        cfg = compose(REPO / "config", "inference", overrides=[
            f"paths.checkpoint={tmp}/ckpt/last",
            f"paths.input_dir={tmp}",
            f"paths.mask_dir={tmp}/ignore",
            f"paths.output_dir={tmp}/out",
            "paths.additional_channels={}",
            f"data.patch_size={PS}",
            "+inference.temporal.enabled=true",
            "+inference.temporal.flow_source=device",
            "+inference.temporal.depth=3",
            f"+inference.temporal.flow_scale={scale}",
        ])
        eng = StyleTransferInference(cfg)

        def t_chain(n, eng=eng):
            carry = (None, None)
            t0 = time.perf_counter()
            u8 = None
            for i in range(n):
                u8, _, carry = eng._chain_step(fdevs[i % 3], None, boxes,
                                               carry)
            np.asarray(u8[0, 0, 0])
            return time.perf_counter() - t0

        t_chain(3)
        ms = med_diff_ms(t_chain)
        results[f"whole_chain_fs{scale}_ms"] = round(ms, 3)
        print(f"[chain_parts] whole_chain_fs{scale}: {ms:.2f} ms "
              f"({1e3 / ms:.1f} fps)", file=sys.stderr)

    # ---- attribution summary -------------------------------------------
    for scale in (1, 2):
        parts = (results["flow_s%d_ms" % scale] + results["prep_ms"]
                 + results[f"gen_b{bucket}_ms"])
        whole = results[f"whole_chain_fs{scale}_ms"]
        results[f"attributed_fs{scale}_pct"] = round(parts / whole * 100, 1)
        print(f"[chain_parts] fs{scale}: flow+prep+gen = {parts:.1f} ms "
              f"vs whole {whole:.1f} ms "
              f"({parts / whole * 100:.0f}% attributed)", file=sys.stderr)

    results = {k: (round(v, 3) if isinstance(v, float) else v)
               for k, v in results.items()}
    out = REPO / "docs" / "perf" / "chain_parts_r5.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
