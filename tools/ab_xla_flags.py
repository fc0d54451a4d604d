#!/usr/bin/env python
"""Interleaved A/B of XLA compiler-option candidates on the hot programs.

Single timing windows on this shared TPU swing +/-2x, and multi-MB fetches
add hundreds of ms of transport variance (see docs/perf/xla_sweep.json: the
SAME compiled program measured 99-217 us/tile across one sweep). This
interleaves candidate measurements round-robin in randomized order over many
rounds, drains the dispatch queue with a 4-byte fetch, and compares
per-program MINIMA/medians. Candidates are verified to match the default
compile numerically before timing.

Programs:
  gen        - generator tile-batch forward (bucket B)
  multiframe - the full fpd=3 tiled frame program (gather+gen+blend)
  fullframe  - the one-pass whole-frame program (512x910)
  train      - the fused GAN train step (batch 80)

Usage: python tools/ab_xla_flags.py [--program gen] [bucket] [rounds]
                                    [--candidates default|fine] [--json out.json]

Measured (v5e, docs/perf/xla_ab_*.json): a raised scoped-VMEM budget wins
the generator (-17%: 131 -> ~108 us/tile at B=512) and the full multiframe
program (vmem_28m -19%: 23.3 -> 19.0 ms/frame min), is neutral on the
train step (+-0.4%), and >=48 MiB is catastrophic (10x). 28 MiB (the
focus-set winner on the full program) ships via resolve_xla_options("auto")
for every TPU compile.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.models import GeneratorJ

JSON_OUT = None
PROGRAM = "gen"
CAND_SET = "default"
args, argv = [], sys.argv[1:]
while argv:
    a = argv.pop(0)
    if a == "--json":
        JSON_OUT = argv.pop(0)
    elif a == "--program":
        PROGRAM = argv.pop(0)
    elif a == "--candidates":
        CAND_SET = argv.pop(0)
    else:
        args.append(a)
B = int(args[0]) if len(args) > 0 else 512
ROUNDS = int(args[1]) if len(args) > 1 else 10
PS, C, N = 80, 6, 8
DT = jnp.bfloat16

CANDIDATES = [
    ("default", {}),
    ("vmem_28m", {"xla_tpu_scoped_vmem_limit_kib": "28672"}),  # shipped
]

# finer sweep around the raised-VMEM winner (--candidates fine); measured:
# 28 MiB edges 32 on the full multiframe program, combos add nothing
FINE_CANDIDATES = [
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_28m", {"xla_tpu_scoped_vmem_limit_kib": "28672"}),
    ("vmem_36m", {"xla_tpu_scoped_vmem_limit_kib": "36864"}),
    ("vmem_40m", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    ("v32_norwb", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                   "xla_tpu_rwb_fusion": "false"}),
    ("v32_licm2", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                   "xla_tpu_licm_size_inflation_ratio": "2"}),
]

if CAND_SET == "fine":
    CANDIDATES = [CANDIDATES[0]] + FINE_CANDIDATES
elif CAND_SET == "focus":
    CANDIDATES = [
        ("vmem_28m", {"xla_tpu_scoped_vmem_limit_kib": "28672"}),
        ("vmem_30m", {"xla_tpu_scoped_vmem_limit_kib": "30720"}),
        ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ]


def build_gen():
    gen = GeneratorJ(input_channels=C, use_bias=True, tanh=True,
                     append_smoothers=True, resnet_blocks=7,
                     filters=(32, 64, 128, 128, 128, 64),
                     norm_layer="instance_norm", dtype=DT)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, PS, PS, C)))
    return gen, g_vars


def make_program():
    """Returns (lowered, example_args, units_per_call, unit_name) for the
    selected program."""
    rng = np.random.default_rng(0)
    if PROGRAM == "gen":
        gen, g_vars = build_gen()
        sets = [jnp.asarray(
            rng.random((B, PS, PS, C), np.float32) * 2 - 1, DT)
            for _ in range(3)]
        lowered = jax.jit(
            lambda t: gen.apply(g_vars, t, train=False)).lower(
            jax.ShapeDtypeStruct((B, PS, PS, C), DT))
        return lowered, sets, B, "us/tile"
    if PROGRAM == "fullframe":
        from patch_toon_tpu.infer.engine import make_fullframe_fn

        h, w = 512, 910
        gen, g_vars = build_gen()
        sets = [jnp.asarray(rng.random((h, w, C), np.float32) * 2 - 1)
                for _ in range(3)]
        mask = jnp.ones((h, w, 1), jnp.float32)
        raw = make_fullframe_fn(gen, h, w, C, DT)

        def body(frame):
            return raw.__wrapped__(g_vars, frame, mask)

        lowered = jax.jit(body).lower(
            jax.ShapeDtypeStruct((h, w, C), jnp.float32))
        return lowered, sets, 1, "ms/frame"
    if PROGRAM == "multiframe":
        from patch_toon_tpu.infer.engine import make_multiframe_fn
        from patch_toon_tpu.infer.tiling import (bucket_size,
                                                 pack_boxes_multi,
                                                 tile_boxes_from_mask)

        h, w, fpd = 512, 910, 3
        gen, g_vars = build_gen()
        mask = np.ones((h, w), np.float32)
        boxes = tile_boxes_from_mask(mask, PS, 30.0)
        bucket = bucket_size(fpd * len(boxes))
        fb, wts, _ = pack_boxes_multi([boxes] * fpd, PS, bucket)
        sets = [jnp.asarray(rng.random((fpd, h, w, C), np.float32) * 2 - 1)
                for _ in range(3)]
        consts = (jnp.asarray(fb), jnp.asarray(wts),
                  jnp.asarray(np.stack([mask] * fpd))[..., None])

        raw = make_multiframe_fn(gen, PS, bucket, fpd, h, w, C, DT)

        # raw is already jitted; its __wrapped__ is the traceable python fn
        def body(frames):
            return raw.__wrapped__(g_vars, frames, *consts)

        lowered = jax.jit(body).lower(
            jax.ShapeDtypeStruct((fpd, h, w, C), jnp.float32))
        return lowered, sets, fpd, "ms/frame"
    if PROGRAM == "train":
        from patch_toon_tpu.train import StyleTransferModel, make_train_step

        batch_size = 80
        model = StyleTransferModel(
            generator_config={"type": "GeneratorJ", "args": dict(
                input_channels=6, use_bias=True, tanh=True,
                append_smoothers=True, resnet_blocks=7,
                filters=[32, 64, 128, 128, 128, 64])},
            discriminator_config={"type": "DiscriminatorN_IN", "args": dict(
                num_filters=12, n_layers=2, use_noise=False,
                norm_layer="instance_norm", use_bias=True,
                input_channels=3)},
            training_config=dict(
                batch_size=batch_size, reconstruction_weight=4.0,
                adversarial_weight=0.5, use_image_loss=True,
                reconstruction_criterion="L1Loss",
                adversarial_criterion="MSELoss",
                use_gradient_clipping=True, gradient_clip_val=0.5,
                precision="bf16"),
            optimizer_config=dict(
                generator=dict(lr=4e-4, betas=[0.9, 0.999],
                               weight_decay=1e-5),
                discriminator=dict(lr=4e-4, betas=[0.9, 0.999],
                                   weight_decay=1e-5)),
            data_config=dict(patch_size=PS, additional_channels={
                "point_vector": {"path": "unused", "depth": 3}}),
            perception_loss_config={
                "weight": 6.0,
                "perception_model": {"type": "PerceptualVGG19", "args": {
                    "feature_layers": [0, 3, 5],
                    "use_normalization": False, "path": None}}},
        )
        state = model.init_state(jax.random.PRNGKey(0), patch_size=PS)
        rng_j = jax.random.PRNGKey(1)
        batch = {
            "pre": jax.random.uniform(rng_j, (batch_size, PS, PS, 3)) * 2 - 1,
            "post": jax.random.uniform(rng_j, (batch_size, PS, PS, 3)) * 2 - 1,
            "channels": jax.random.uniform(
                rng_j, (batch_size, PS, PS, 3)) * 2 - 1,
        }
        step = make_train_step(model, donate=False, xla_options="none")

        def body(st, r):
            return step.__wrapped__(st, batch, r)

        lowered = jax.jit(body).lower(state, rng_j)
        sets = [jax.random.fold_in(rng_j, i) for i in range(3)]
        return lowered, (state, sets), batch_size, "patches/ms"
    raise SystemExit(f"unknown --program {PROGRAM}")


def main():
    lowered, sets, units, unit_name = make_program()
    fns = []
    for label, opts in CANDIDATES:
        fn = lowered.compile(compiler_options=opts) if opts \
            else lowered.compile()
        fns.append((label, fn))

    if PROGRAM == "train":
        state, rngs = sets

        def call(fn, i):
            _, m = fn(state, rngs[i % 3])
            return m["g_total_loss"]

        ref = float(fns[0][1](state, rngs[0])[1]["g_total_loss"])
        for label, fn in fns[1:]:
            got = float(fn(state, rngs[0])[1]["g_total_loss"])
            print(f"{label:12s} ref_loss={ref:.6f} got={got:.6f}", flush=True)
            assert abs(got - ref) < 1e-2 * max(1.0, abs(ref))
    else:
        def call(fn, i):
            return fn(sets[i % 3])

        def float_out(fn):
            out = fn(sets[0])
            # multiframe returns (u8, float canvas); compare the float one
            # (u8 legitimately flips by 1 count when fusion changes rounding)
            if isinstance(out, tuple):
                out = out[-1]
            return np.asarray(out, np.float32)

        ref = float_out(fns[0][1])
        for label, fn in fns[1:]:
            got = float_out(fn)
            close = np.allclose(ref, got, atol=1e-2)
            print(f"{label:12s} close={close} "
                  f"max_abs={np.abs(ref - got).max():.2e}", flush=True)
            assert close, f"{label} output diverges from default compile"

    def drain(out):
        # 4-byte fetch that forces the queued stream to finish
        np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])

    def window(fn):
        def timed(k):
            out = None
            for i in range(k):
                out = call(fn, i)
            drain(out)

        t0 = time.perf_counter()
        timed(N)
        t1 = time.perf_counter()
        timed(2 * N)
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / N

    for _, fn in fns:  # warm
        drain(call(fn, 0))

    order_rng = np.random.default_rng(1)
    times = {label: [] for label, _ in fns}
    for r in range(ROUNDS):
        for i in order_rng.permutation(len(fns)):
            label, fn = fns[i]
            times[label].append(window(fn))
        print(f"round {r}: " + "  ".join(
            f"{lb}={min(ts) * 1e3:.2f}ms" for lb, ts in times.items()),
            flush=True)

    summary = {}
    for lb, ts in times.items():
        mn, md = min(ts), float(np.median(ts))
        if unit_name == "us/tile":
            disp = f"min {mn * 1e6 / units:6.1f}  median " \
                   f"{md * 1e6 / units:6.1f} us/tile"
        elif unit_name == "ms/frame":
            disp = f"min {mn * 1e3 / units:6.2f}  median " \
                   f"{md * 1e3 / units:6.2f} ms/frame"
        else:
            disp = f"min {units / (mn * 1e3):6.1f}  median " \
                   f"{units / (md * 1e3):6.1f} patches/ms"
        print(f"{lb:12s} {disp}")
        summary[lb] = {"min_s": mn, "median_s": md,
                       "windows_ms": [t * 1e3 for t in ts]}
    if JSON_OUT:
        Path(JSON_OUT).parent.mkdir(parents=True, exist_ok=True)
        Path(JSON_OUT).write_text(json.dumps(
            {"program": PROGRAM, "rounds": ROUNDS,
             **({"bucket": B} if PROGRAM == "gen" else {}),
             "units_per_call": units, "summary": summary}, indent=1))
        print(f"wrote {JSON_OUT}")


if __name__ == "__main__":
    main()
