"""Attribute the tiled streaming-vs-cap gap (bench r5: 23.6 fps streaming
vs 28.6 fps adjacent D2H cap, ratio 0.82 — while the masked arm's small
fetches hit 0.98).

The tiled streaming arm (bench.py:212-224) interleaves program dispatches
with per-frame slice fetches through a 6-thread pool; the cap probe
(bench.py:57-86) fetches 6 fresh same-size arrays with NOTHING else
running. Candidates for the ~22 ms/dispatch residual:

  A. the drain pattern itself (o[k] slice dispatch + window bookkeeping)
     is slower than the probe's clean pool.map;
  B. device-side serialization: the tunnel executes D2H reads and compute
     on the same effective stream, so a dispatch's compute time partially
     adds to the fetch time instead of hiding under it;
  C. host-side interference: fn() dispatch on the main thread vs 6
     fetching workers (GIL / tunnel-connection contention).

Arms (each with its OWN immediately-adjacent cap probe, best-of-windows,
matching the bench estimator exactly):

  probe            the bench cap probe itself (reference point)
  drain_only       N precomputed outputs drained via the bench's
                   _submit_frames pattern — no dispatches in the loop.
                   ≈probe ⇒ A is innocent.
  drain_presliced  same but the per-frame slices are materialized before
                   the timed window — isolates the o[k] slice dispatch.
  drain_dispatch   the real streaming loop (bench's one_window): dispatch
                   + drain interleaved. The measured 0.82.
  drain_dispatch_cheap  same loop shape but the dispatched program is a
                   trivial 1-element op — keeps the host dispatch path and
                   GIL pattern, removes device compute. ≈probe ⇒ B (device
                   serialization); ≈drain_dispatch ⇒ C (host interference).

Writes docs/perf/stream_gap_r5.json.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _arm_cap_fps, _submit_frames
    from concurrent.futures import ThreadPoolExecutor

    from patch_toon_tpu.infer.programs import make_multiframe_fn
    from patch_toon_tpu.infer.tiling import (
        bucket_size,
        pack_boxes_multi,
        tile_boxes_from_mask,
    )
    from patch_toon_tpu.models import GeneratorJ
    from patch_toon_tpu.utils.xla_options import resolve_xla_options

    h, w, c, ps, fpd = 512, 910, 6, 80, 3
    frames = 30
    mb = h * w * 3 / 1e6

    gen = GeneratorJ(
        input_channels=c, use_bias=True, tanh=True, append_smoothers=True,
        resnet_blocks=7, filters=(32, 64, 128, 128, 128, 64),
        dtype=jnp.bfloat16,
    )
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, c)))
    mask = np.ones((h, w), np.float32)
    boxes = tile_boxes_from_mask(mask, ps, 30.0)
    bucket = bucket_size(fpd * len(boxes))
    fb, wts, _ = pack_boxes_multi([boxes] * fpd, ps, bucket)
    fn = make_multiframe_fn(gen, ps, bucket, fpd, h, w, c, jnp.bfloat16,
                            compiler_options=resolve_xla_options("auto"))
    rng = np.random.default_rng(0)
    frame_batch = [jnp.asarray(rng.random((fpd, h, w, c), np.float32) * 2 - 1)
                   for _ in range(3)]
    pb_j, wts_j = jnp.asarray(fb), jnp.asarray(wts)
    mask_j = jnp.asarray(np.stack([mask] * fpd))[..., None]
    args = (pb_j, wts_j, mask_j)
    for i in range(4):
        np.asarray(fn(g_vars, frame_batch[i % 3], *args)[0])

    # a trivial program with the same host dispatch shape (same arg count)
    cheap = jax.jit(lambda v, f, a, b, m: (f[:, :1, :1, :1], 0))
    np.asarray(cheap(g_vars, frame_batch[0], *args)[0])

    fetch_pool = ThreadPoolExecutor(max_workers=6)
    dispatches = frames // fpd
    out = {"h": h, "w": w, "fpd": fpd, "frames": frames,
           "dispatches": dispatches}

    def timed(fn_window, key: str) -> float:
        """best-of-3 windows (matches the bench arm estimator), with an
        adjacent cap probe so tunnel drift can't masquerade as overhead."""
        fps = max(fn_window() for _ in range(3))
        cap = _arm_cap_fps(mb)
        out[key] = round(fps, 3)
        out[key + "_cap"] = round(cap, 3)
        out[key + "_ratio"] = round(fps / cap, 3)
        print(f"[gap] {key}: {fps:.1f} fps (cap {cap:.1f}, "
              f"ratio {fps / cap:.2f})", flush=True)
        return fps

    # --- drain_only: outputs precomputed, drain pattern untimed by compute
    def w_drain_only() -> float:
        outs = [fn(g_vars, frame_batch[i % 3], *args)[0]
                for i in range(dispatches)]
        jax.block_until_ready(outs)
        # force fresh host copies: JAX caches the host copy per array, so
        # re-fetching a fetched array is free — rebuild per window
        t0 = time.perf_counter()
        in_flight: list = []
        for o in outs:
            _submit_frames(fetch_pool, in_flight, o)
        for f in in_flight:
            f.result()
        dt = time.perf_counter() - t0
        for o in outs:
            o.delete()
        return dispatches * fpd / dt

    # --- drain_presliced: slices materialized before the timed window
    def w_drain_presliced() -> float:
        outs = [fn(g_vars, frame_batch[i % 3], *args)[0]
                for i in range(dispatches)]
        sl = [o[k] for o in outs for k in range(fpd)]
        jax.block_until_ready(sl)
        t0 = time.perf_counter()
        in_flight = []
        for s in sl:
            try:
                s.copy_to_host_async()
            except Exception:
                pass
            in_flight.append(fetch_pool.submit(np.asarray, s))
            while len(in_flight) > 8:
                in_flight.pop(0).result()
        for f in in_flight:
            f.result()
        dt = time.perf_counter() - t0
        for o in outs:
            o.delete()
        return len(sl) / dt

    # --- the real streaming loop (bench one_window)
    def w_dispatch(program) -> float:
        t0 = time.perf_counter()
        in_flight: list = []
        for i in range(dispatches):
            o, _ = program(g_vars, frame_batch[i % 3], *args)
            _submit_frames(fetch_pool, in_flight, o)
        for f in in_flight:
            f.result()
        return dispatches * fpd / (time.perf_counter() - t0)

    # NOTE drain_dispatch_cheap fetches the REAL precomputed outputs while
    # dispatching the trivial program: same wire bytes, same dispatch
    # cadence, no device compute.
    def w_dispatch_cheap() -> float:
        outs = [fn(g_vars, frame_batch[i % 3], *args)[0]
                for i in range(dispatches)]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        in_flight: list = []
        for i, o in enumerate(outs):
            cheap(g_vars, frame_batch[i % 3], *args)
            _submit_frames(fetch_pool, in_flight, o)
        for f in in_flight:
            f.result()
        dt = time.perf_counter() - t0
        for o in outs:
            o.delete()
        return dispatches * fpd / dt

    timed(w_drain_only, "drain_only")
    timed(w_drain_presliced, "drain_presliced")
    timed(lambda: w_dispatch(fn), "drain_dispatch")
    timed(w_dispatch_cheap, "drain_dispatch_cheap")
    # repeat the real arm last to bracket drift
    timed(lambda: w_dispatch(fn), "drain_dispatch_again")

    dest = Path(__file__).resolve().parent.parent / "docs/perf/stream_gap_r5.json"
    dest.write_text(json.dumps(out, indent=1))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
