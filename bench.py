#!/usr/bin/env python
"""Benchmark: stylized 512p frames/sec/chip (the north-star metric).

Runs the real inference hot path — full-frame tiled stylization of a
512x910 frame with the shipped default model (6-channel input, patch 80,
30% overlap, full mask) in bf16 on whatever accelerator jax exposes — and
prints ONE JSON line.

``vs_baseline`` is measured against the north-star target of 30 frames/sec/
chip (BASELINE.json: the reference publishes no numbers and cannot run in
this image — pytorch_lightning is absent — so the driver's target is the
comparison base; >1.0 beats it).

Also measures training patches/sec as a secondary metric (printed to stderr).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _submit_frames(fetch_pool, in_flight: list, o, window: int = 8) -> None:
    """Queue per-FRAME slice fetches of a batched (F, h, w, 3) output and
    bound the in-flight window (counted in frames).

    Mirrors the engine's drain (infer/engine.py dispatch_group): slicing
    the group output into F device arrays multiplies concurrent wire
    streams and restores 1-frame granularity at fpd>1 — measured 3.7x
    streaming vs a whole-group fetch on a contended tunnel
    (tools/profile_sliced_fetch.py)."""
    for k in range(o.shape[0]):
        s = o[k]
        try:
            s.copy_to_host_async()
        except Exception:
            pass
        in_flight.append(fetch_pool.submit(np.asarray, s))
    while len(in_flight) > window:
        in_flight.pop(0).result()


def _paired_windows(arm_window, ceiling_window, k: int = 3):
    """Run ``k`` (arm, zero-compute-ceiling) window PAIRS back-to-back and
    return (best arm fps, best ceiling fps).

    The ceiling is the arm's own drain with compute removed — same wire
    bytes, same fetch pattern, sampled within seconds of the arm window it
    calibrates. On a tunnel whose bandwidth moves minute-to-minute this
    pairing is the only estimator whose ratio noise stays bounded: r5
    measured synthetic-probe ratios of 0.41-1.11 for identical streaming
    code while the interleaved drain comparison stayed flat
    (docs/perf/stream_gap_r5.json)."""
    arm, cap = [], []
    for _ in range(k):
        arm.append(arm_window())
        cap.append(ceiling_window())
    return max(arm), max(cap)


_PROBE_POOL = None


def _probe_pool():
    from concurrent.futures import ThreadPoolExecutor

    global _PROBE_POOL
    if _PROBE_POOL is None:
        _PROBE_POOL = ThreadPoolExecutor(max_workers=6)
    return _PROBE_POOL


def _probe_d2h_MBps(mb: float, n: int = 18, window: int = 8) -> float:
    """SUSTAINED concurrent D2H rate on fresh arrays of exactly ``mb`` MB
    each, drained through the same incremental-submit + in-flight-window
    pattern as ``_submit_frames`` (what every streaming arm rides).

    Run IMMEDIATELY ADJACENT to a streaming arm (VERDICT r4 #1): the tunnel
    drifts within a single bench run (r4 recorded 14.7->28.7 MB/s between
    the start and end probes), so only a probe matched in size AND time to
    the arm it calibrates can separate congestion from a streaming-path
    regression. Matched in PATTERN too (r5, docs/perf/stream_gap_r5.json):
    a short 6-fetch burst reads 15-25% above the sustained windowed rate
    (TCP buffering), so the old burst probe made a perfectly-overlapped
    drain look like a 0.8-ratio regression — while the same drain measured
    identical fps with and without compute dispatches interleaved. Every
    timed fetch touches a never-fetched array (JAX caches the host copy
    on the array)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    size = max(1, int(mb * 1e6))
    # bound probe wall time on small fetches: at least ~25 MB per window
    n = max(n, min(64, int(25.0 / max(mb, 0.05))))
    pool = _probe_pool()

    def fresh(k):
        a = [jnp.asarray(rng.integers(0, 255, size, dtype=np.uint8))
             for _ in range(k)]
        jax.block_until_ready(a)
        return a

    list(pool.map(np.asarray, fresh(6)))  # warm
    rates = []
    for _ in range(2):
        batch = fresh(n)
        t0 = time.perf_counter()
        in_flight = []
        for a in batch:
            in_flight.append(pool.submit(np.asarray, a))
            while len(in_flight) > window:
                in_flight.pop(0).result()
        for f in in_flight:
            f.result()
        rates.append(n * mb / (time.perf_counter() - t0))
    return float(max(rates))  # arms report best-of-windows; match that


def _probe_h2d_MBps(mb: float, n: int = 4) -> float:
    """H2D rate on ``mb``-MB uint8 uploads, window-differenced (the tunnel
    resolves block_until_ready early — completion is proven by a 1-element
    round-trip per array, and two window sizes cancel that fixed cost)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    size = max(1, int(mb * 1e6))
    pool = _probe_pool()

    def window(k: int) -> float:
        hosts = [rng.integers(0, 255, size, dtype=np.uint8)
                 for _ in range(k)]
        t0 = time.perf_counter()
        arrs = [jnp.asarray(x) for x in hosts]
        list(pool.map(lambda a: np.asarray(a[0]), arrs))
        return time.perf_counter() - t0

    window(1)  # warm
    # two differenced samples, keep the FASTER (smaller diff): arms report
    # best-of-windows, and a single noisy difference understated the cap
    # by up to 40% on a drifting tunnel (r5 cu ratio 1.40)
    diffs = [max(window(2 * n) - window(n), 1e-9) for _ in range(2)]
    return n * mb / min(diffs)


def _arm_cap_fps(d2h_mb: float, h2d_mb: float = 0.0) -> float:
    """Transport ceiling in frames/s for an arm whose per-frame wire
    pattern is ``d2h_mb`` fetched (+ ``h2d_mb`` uploaded; the tunnel is
    half-duplex in practice, so directions add)."""
    sec = d2h_mb / _probe_d2h_MBps(d2h_mb)
    if h2d_mb > 0:
        sec += h2d_mb / _probe_h2d_MBps(h2d_mb)
    return 1.0 / sec


def bench_inference(frames: int = 30) -> dict:
    """Tiled (reference-parity) mode: streaming AND compute-only rates.

    - streaming: full uint8 frame readback per frame, async-overlapped —
      what a real video pipeline pays. Through the remote tunnel this is
      transport-gated and can vary 5-10x with congestion (measured 15-170
      MB/s on the same day), so it is reported best-of-3 windows.
    - compute_only: dispatch-difference timing (T(2N)-T(N) queued dispatches,
      one final fetch) — pure device throughput, transport-free.

    Both are measured at frames-per-dispatch 1 and 3; co-batching 3 frames
    fills the pow2 tile bucket (510/512 vs 170/256 = 34% padding) and is
    ~27% faster compute, but its 3x-larger readback granularity can lose
    when the transport is congested.
    """
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    from patch_toon_tpu.infer.engine import make_multiframe_fn
    from patch_toon_tpu.infer.tiling import (
        bucket_size,
        pack_boxes_multi,
        tile_boxes_from_mask,
    )

    fetch_pool = ThreadPoolExecutor(max_workers=6)
    from patch_toon_tpu.models import GeneratorJ
    from patch_toon_tpu.utils.xla_options import resolve_xla_options

    xla_opts = resolve_xla_options("auto")  # what the shipped engine applies

    h, w, c = 512, 910, 6  # 512p, 16:9
    ps = 80
    gen = GeneratorJ(
        input_channels=c, use_bias=True, tanh=True, append_smoothers=True,
        resnet_blocks=7, filters=(32, 64, 128, 128, 128, 64),
        dtype=jnp.bfloat16,
    )
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, c)))

    mask = np.ones((h, w), np.float32)
    boxes = tile_boxes_from_mask(mask, ps, 30.0)
    rng = np.random.default_rng(0)

    results = {"tiles_per_frame": len(boxes)}
    best_stream, best_compute = 0.0, 0.0
    for fpd in (1, 3):
        bucket = bucket_size(fpd * len(boxes))
        fb, wts, _ = pack_boxes_multi([boxes] * fpd, ps, bucket)
        fn = make_multiframe_fn(gen, ps, bucket, fpd, h, w, c, jnp.bfloat16,
                                compiler_options=xla_opts)
        frame_batch = [
            jnp.asarray(rng.random((fpd, h, w, c), np.float32) * 2 - 1)
            for _ in range(3)
        ]
        pb_j, wts_j = jnp.asarray(fb), jnp.asarray(wts)
        mask_j = jnp.asarray(np.stack([mask] * fpd))[..., None]
        args = (pb_j, wts_j, mask_j)

        for i in range(4):  # compile + steady-state warm
            np.asarray(fn(g_vars, frame_batch[i % 3], *args)[0])

        # compute-only: queue n dispatches, one TINY fetch (a sliced pixel —
        # a multi-MB fetch's transport time varies by hundreds of ms through
        # the tunnel and would swamp the difference); difference cancels the
        # fixed dispatch cost
        def queued(n):
            out = None
            t0 = time.perf_counter()
            for i in range(n):
                out = fn(g_vars, frame_batch[i % 3], *args)
            np.asarray(out[0][0, 0, 0])
            return time.perf_counter() - t0

        # The differenced window must DWARF the tiny-fetch sync's noise
        # (hundreds of ms through a congested tunnel): big n, and the
        # MEDIAN of several differences — a max-of-differences estimator
        # inflates unboundedly when one fetch lands fast (r3 recorded a
        # physically impossible 126 fps that way: 46 us/tile vs the
        # measured ~97 us/tile generator floor).
        n = max(8, frames // fpd)
        compute_fps = float(np.median(
            [fpd * n / max(queued(2 * n) - queued(n), 1e-9)
             for _ in range(3)]))

        # streaming: every frame fully fetched, concurrent thread-fetches
        # exactly like the engine's drain (6 streams ~2.1x serial tunnel
        # bandwidth, tools/profile_transport.py)
        def one_window() -> float:
            dispatches = max(1, frames // fpd)
            t0 = time.perf_counter()
            in_flight = []
            for i in range(dispatches):
                o, _ = fn(g_vars, frame_batch[i % 3], *args)
                _submit_frames(fetch_pool, in_flight, o)
            for f in in_flight:
                f.result()
            return dispatches * fpd / (time.perf_counter() - t0)

        # The cap is the arm's OWN drain with compute removed (outputs
        # precomputed before the timed window) — a zero-compute ceiling,
        # pattern-matched byte-for-byte and INTERLEAVED window-by-window
        # with the arm. Synthetic burst probes read 15-25% above the
        # sustained drain rate (TCP buffering) and drift minute-to-minute
        # against arms sampled at a different moment — r5 recorded ratios
        # 0.41-1.11 for identical code (docs/perf/stream_gap_r5.json);
        # the drain-vs-drain pairing is what that study used to show
        # streaming loses ~nothing to compute overlap.
        def ceiling_window() -> float:
            dispatches = max(1, frames // fpd)
            outs = [fn(g_vars, frame_batch[i % 3], *args)[0]
                    for i in range(dispatches)]
            jax.block_until_ready(outs)
            t0 = time.perf_counter()
            in_flight = []
            for o in outs:
                _submit_frames(fetch_pool, in_flight, o)
            for f in in_flight:
                f.result()
            dt = time.perf_counter() - t0
            for o in outs:
                o.delete()
            return dispatches * fpd / dt

        stream_fps, cap = _paired_windows(one_window, ceiling_window)
        print(f"[bench] tiled fpd={fpd} bucket={bucket}: "
              f"compute-only {compute_fps:.1f} fps, "
              f"streaming {stream_fps:.1f} fps "
              f"(adjacent cap {cap:.1f}, ratio {stream_fps / cap:.2f})",
              file=sys.stderr)
        results[f"tiled_fpd{fpd}_compute_only"] = round(compute_fps, 3)
        results[f"tiled_fpd{fpd}_streaming"] = round(stream_fps, 3)
        results[f"tiled_fpd{fpd}_cap_fps"] = round(cap, 3)
        results[f"tiled_fpd{fpd}_vs_cap"] = round(stream_fps / cap, 3)
        if stream_fps > best_stream:
            best_stream = stream_fps
            results["tiled_streaming_vs_cap"] = round(stream_fps / cap, 3)
        best_compute = max(best_compute, compute_fps)

    results["tiled_streaming"] = round(best_stream, 3)
    results["tiled_compute_only"] = round(best_compute, 3)

    # Representative masked workload: the reference's actual use case
    # stylizes a masked character (~35-40% of the frame), where the engine's
    # crop_readback fetches only the 64-aligned mask-support bbox and
    # reconstructs the rest from the input bytes (bit-identical). Measured
    # with and without the cropped fetch to expose the transport saving.
    from patch_toon_tpu.infer.tiling import frames_per_dispatch

    from patch_toon_tpu.infer.engine import (
        compute_crop_bbox,
        mask_support_bbox,
    )

    m2 = np.zeros((h, w), np.float32)
    m2[100:412, 180:730] = 1.0  # 36.8% of the frame
    # the engine's own crop logic (mask-support bbox, 64-aligned) — derived,
    # not hand-coded, so engine changes can't silently desync the bench
    bbox = compute_crop_bbox([mask_support_bbox(m2)], h, w)
    assert bbox is not None, "bench mask unexpectedly maps to a full fetch"
    y0, y1, x0, x1 = bbox
    boxes2 = tile_boxes_from_mask(m2, ps, 30.0)
    fpd2 = frames_per_dispatch(len(boxes2))
    bucket2 = bucket_size(fpd2 * len(boxes2))
    fb2, wts2, _ = pack_boxes_multi([boxes2] * fpd2, ps, bucket2)
    fn2 = make_multiframe_fn(gen, ps, bucket2, fpd2, h, w, c, jnp.bfloat16,
                             compiler_options=xla_opts)
    m2_j = jnp.asarray(np.stack([m2] * fpd2))[..., None]
    mframes = [jnp.asarray(rng.random((fpd2, h, w, c), np.float32) * 2 - 1)
               for _ in range(3)]
    # boxes/weights ride device-resident, like the engine: a static mask's
    # layout is uploaded once and cached (engine._packed_cached), so the
    # timed loop must not re-pay the multi-MB weights H2D per dispatch
    fb2_dev, wts2_dev = jnp.asarray(fb2), jnp.asarray(wts2)
    for i in range(3):
        np.asarray(fn2(g_vars, mframes[i % 3], fb2_dev, wts2_dev, m2_j)[0])

    def masked_window(crop: bool) -> float:
        dispatches = max(1, frames // fpd2)
        t0 = time.perf_counter()
        in_flight = []
        for i in range(dispatches):
            o, _ = fn2(g_vars, mframes[i % 3], fb2_dev, wts2_dev, m2_j)
            if crop:
                o = o[:, y0:y1, x0:x1]
            _submit_frames(fetch_pool, in_flight, o)
        for f in in_flight:
            f.result()
        return dispatches * fpd2 / (time.perf_counter() - t0)

    def masked_ceiling() -> float:
        dispatches = max(1, frames // fpd2)
        outs = [fn2(g_vars, mframes[i % 3], fb2_dev, wts2_dev,
                    m2_j)[0][:, y0:y1, x0:x1]
                for i in range(dispatches)]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        in_flight = []
        for o in outs:
            _submit_frames(fetch_pool, in_flight, o)
        for f in in_flight:
            f.result()
        dt = time.perf_counter() - t0
        for o in outs:
            o.delete()
        return dispatches * fpd2 / dt

    crop_fps, crop_cap = _paired_windows(
        lambda: masked_window(True), masked_ceiling)
    full_fps = max(masked_window(False) for _ in range(3))
    print(f"[bench] tiled masked(37%) fpd={fpd2}: streaming "
          f"{crop_fps:.1f} fps cropped fetch (adjacent cap {crop_cap:.1f}, "
          f"ratio {crop_fps / crop_cap:.2f}), {full_fps:.1f} full fetch",
          file=sys.stderr)
    results["tiled_masked_streaming"] = round(crop_fps, 3)
    results["tiled_masked_streaming_fullfetch"] = round(full_fps, 3)
    results["tiled_masked_cap_fps"] = round(crop_cap, 3)
    results["tiled_masked_vs_cap"] = round(crop_fps / crop_cap, 3)

    # Upload-INCLUSIVE masked serving — the engine's real wire pattern:
    # uint8 frame upload + bit-packed mask each dispatch, cropped fetch.
    # With inference.crop_upload (default) the whole dispatch domain
    # shrinks to the bucketed tile read-union window, cutting BOTH wire
    # directions bit-identically (engine.upload_crop_window).
    from patch_toon_tpu.infer.engine import upload_crop_window

    win = upload_crop_window(boxes2, h, w, ps)
    assert win is not None, "bench mask unexpectedly maps to no window"
    wy0, wy1, wx0, wx1 = win
    bh, bw = wy1 - wy0, wx1 - wx0
    boxes2c = [(b[0] - wy0, b[1] - wy0, b[2] - wx0, b[3] - wx0)
               for b in boxes2]
    fb2c, wts2c, _ = pack_boxes_multi([boxes2c] * fpd2, ps, bucket2)
    fn2c = make_multiframe_fn(gen, ps, bucket2, fpd2, bh, bw, c,
                              jnp.bfloat16, compiler_options=xla_opts)
    hosts = [(rng.random((fpd2, h, w, c)) * 255).astype(np.uint8)
             for _ in range(3)]
    hosts_c = [x[:, wy0:wy1, wx0:wx1].copy() for x in hosts]
    mk_full = jnp.asarray(np.packbits(
        np.stack([m2.astype(np.uint8)] * fpd2).reshape(fpd2, -1), axis=-1))
    mk_crop = jnp.asarray(np.packbits(
        np.stack([m2[wy0:wy1, wx0:wx1].astype(np.uint8)] * fpd2
                 ).reshape(fpd2, -1), axis=-1))
    fb2c_j, wts2c_j = jnp.asarray(fb2c), jnp.asarray(wts2c)
    fb2_j, wts2_j = jnp.asarray(fb2), jnp.asarray(wts2)
    np.asarray(fn2c(g_vars, jnp.asarray(hosts_c[0]), fb2c_j, wts2c_j,
                    mk_crop)[0])  # compile
    np.asarray(fn2(g_vars, jnp.asarray(hosts[0]), fb2_j, wts2_j,
                   mk_full)[0])  # u8+packed variant of the full program

    def serving_window(cropup: bool) -> float:
        dispatches = max(1, frames // fpd2)
        t0 = time.perf_counter()
        in_flight = []
        for i in range(dispatches):
            if cropup:
                o, _ = fn2c(g_vars, jnp.asarray(hosts_c[i % 3]),
                            fb2c_j, wts2c_j, mk_crop)
            else:
                o, _ = fn2(g_vars, jnp.asarray(hosts[i % 3]),
                           fb2_j, wts2_j, mk_full)
                o = o[:, y0:y1, x0:x1]
            _submit_frames(fetch_pool, in_flight, o)
        for f in in_flight:
            f.result()
        return dispatches * fpd2 / (time.perf_counter() - t0)

    # BIDIRECTIONAL zero-compute ceiling, interleaved with the arm: the
    # same u8 c6 window uploads cross the wire (device_put, completion
    # forced before the clock stops) and the same u8 RGB windows come
    # back (device-PRODUCED outputs — an array made from host bytes keeps
    # a cached host copy and its fetch would be free), with no generator
    # compute between them.
    def serving_ceiling() -> float:
        dispatches = max(1, frames // fpd2)
        outs = [fn2c(g_vars, jnp.asarray(hosts_c[i % 3]), fb2c_j,
                     wts2c_j, mk_crop)[0] for i in range(dispatches)]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        in_flight = []
        devs = []
        for i, o in enumerate(outs):
            devs.append(jax.device_put(hosts_c[i % 3]))
            _submit_frames(fetch_pool, in_flight, o)
        for f in in_flight:
            f.result()
        jax.block_until_ready(devs)
        dt = time.perf_counter() - t0
        for o in outs:
            o.delete()
        return dispatches * fpd2 / dt

    cu_fps, cu_cap = _paired_windows(
        lambda: serving_window(True), serving_ceiling)
    ncu_fps = max(serving_window(False) for _ in range(3))
    print(f"[bench] tiled masked(37%) upload-inclusive: "
          f"{cu_fps:.1f} fps crop_upload ({bh}x{bw} window; adjacent bidir "
          f"cap {cu_cap:.1f}, ratio {cu_fps / cu_cap:.2f}), "
          f"{ncu_fps:.1f} fps full-frame upload", file=sys.stderr)
    results["tiled_masked_serving_cropupload"] = round(cu_fps, 3)
    results["tiled_masked_serving_fullupload"] = round(ncu_fps, 3)
    results["tiled_masked_serving_cap_fps"] = round(cu_cap, 3)
    results["tiled_masked_serving_vs_cap"] = round(cu_fps / cu_cap, 3)
    return results


def bench_transport(frames: int = 8) -> dict:
    """Raw device->host transport bandwidth, recorded every bench run.

    The streaming headline is claimed transport-gated (BASELINE.md: the same
    1.4 MB frame fetch measured 9-90 ms across days through the axon
    tunnel); this makes that a *number in the JSON* instead of prose. A
    512x910 uint8 frame is ~1.40 MB, so single-stream transport alone caps
    streaming at ``transport_MBps / 1.4`` fps. Also measures a 4-way
    concurrent row-band fetch (thread-per-slice np.asarray) to test whether
    the tunnel is single-stream-limited.
    """
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    h, w = 512, 910
    mb = h * w * 3 / 1e6
    rng = np.random.default_rng(0)

    # JAX caches the fetched host copy on each array (_npy_value), so a
    # re-fetch of the SAME array measures a dict lookup, not the wire —
    # every timed fetch below must touch a never-fetched array
    def fresh(n):
        a = [jnp.asarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
             for _ in range(n)]
        jax.block_until_ready(a)
        return a

    np.asarray(fresh(1)[0])  # transport warm-up

    times = []
    for a in fresh(frames):
        t0 = time.perf_counter()
        np.asarray(a)
        times.append(time.perf_counter() - t0)
    single_best = mb / min(times)
    single_median = mb / float(np.median(times))

    # concurrent whole-frame fetch, K streams — the engine's actual drain
    # pattern (readback_streams); measures the multiplexed tunnel ceiling
    K = 6
    with ThreadPoolExecutor(max_workers=K) as pool:
        list(pool.map(np.asarray, fresh(K)))  # warm the pool
        ktimes = []
        for _ in range(3):
            batch = fresh(K)
            t0 = time.perf_counter()
            list(pool.map(np.asarray, batch))
            ktimes.append((time.perf_counter() - t0) / K)
    conc_best = mb / min(ktimes)
    conc_median = mb / float(np.median(ktimes))

    # H2D (upload) direction: the engine's per-frame upload is uint8
    # (inference.upload=auto) — c6 frame + mask = ~3.3 MB; the fp32 path
    # it replaced was ~13.1 MB (tools/profile_transport.py h2d_* rows,
    # tools/ab_upload.py). block_until_ready can resolve EARLY through the
    # axon tunnel (CLAUDE.md), so completion is forced the only provable
    # way — a data round trip: one pixel fetched back from EVERY uploaded
    # array (concurrent, so the fetch latency amortizes), and two window
    # sizes differenced to cancel that fixed fetch/dispatch overhead.
    up_mb = h * w * 6 / 1e6  # uint8 c6 frame

    def upload_window(n: int) -> float:
        hosts = [rng.integers(0, 255, (h, w, 6), dtype=np.uint8)
                 for _ in range(n)]
        t0 = time.perf_counter()
        arrs = [jnp.asarray(x) for x in hosts]
        with ThreadPoolExecutor(max_workers=min(6, n)) as pool:
            list(pool.map(lambda a: np.asarray(a[0, 0, 0]), arrs))
        return time.perf_counter() - t0

    upload_window(1)  # warm-up (allocator + fetch path)
    n = 3
    h2d_median = float(np.median(
        [n * up_mb / max(upload_window(2 * n) - upload_window(n), 1e-9)
         for _ in range(2)]))

    # Bidirectional cap: the tunnel is HALF-duplex in practice (upload
    # overlap measured a wash, commit 7c041ab), so a streamed frame pays
    # the D2H fetch AND the H2D upload sequentially on the wire. The
    # parity workload uploads a uint8 c6 frame + bit-packed mask
    # (inference.mask_upload=packed) and fetches the uint8 RGB frame:
    # this cap is what the streaming headline can reach at 100% overlap
    # of compute under transport — streaming/bidir_cap is the honest
    # "how close to the wire's ceiling are we" ratio.
    wire_up_mb = up_mb + h * w / 8 / 1e6  # c6 u8 frame + packed mask
    bidir_cap = 1.0 / (mb / conc_median + wire_up_mb / h2d_median)
    print(f"[bench] transport: single-stream {single_median:.1f} MB/s "
          f"(best {single_best:.1f}), {K}-stream concurrent "
          f"{conc_median:.1f} MB/s (best {conc_best:.1f}); concurrent cap "
          f"{conc_median / mb:.1f} fps @ {mb:.2f} MB/frame; "
          f"h2d {h2d_median:.1f} MB/s; bidir cap {bidir_cap:.1f} fps",
          file=sys.stderr)
    return {
        "transport_MBps": round(single_median, 1),
        "transport_MBps_best": round(single_best, 1),
        "transport_concurrent6_MBps": round(conc_median, 1),
        "transport_concurrent6_MBps_best": round(conc_best, 1),
        "transport_cap_fps": round(conc_median / mb, 1),
        "transport_h2d_MBps": round(h2d_median, 1),
        "transport_bidir_cap_fps": round(bidir_cap, 1),
    }


def bench_training(steps: int = 50) -> float:
    import jax
    import jax.numpy as jnp

    from patch_toon_tpu.train import StyleTransferModel, make_train_step

    batch_size, ps = 80, 80
    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(
            input_channels=6, use_bias=True, tanh=True,
            append_smoothers=True, resnet_blocks=7,
            filters=[32, 64, 128, 128, 128, 64])},
        discriminator_config={"type": "DiscriminatorN_IN", "args": dict(
            num_filters=12, n_layers=2, use_noise=False,
            norm_layer="instance_norm", use_bias=True, input_channels=3)},
        training_config=dict(
            batch_size=batch_size, reconstruction_weight=4.0,
            adversarial_weight=0.5, use_image_loss=True,
            reconstruction_criterion="L1Loss",
            adversarial_criterion="MSELoss",
            use_gradient_clipping=True, gradient_clip_val=0.5,
            precision="bf16"),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
            discriminator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5)),
        data_config=dict(patch_size=ps, additional_channels={
            "point_vector": {"path": "unused", "depth": 3}}),
        perception_loss_config={
            "weight": 6.0,
            "perception_model": {"type": "PerceptualVGG19", "args": {
                "feature_layers": [0, 3, 5], "use_normalization": False,
                "path": None}}},
    )
    state = model.init_state(jax.random.PRNGKey(0), patch_size=ps)
    step = make_train_step(model)
    rng = jax.random.PRNGKey(1)
    batch = {
        "pre": jax.random.uniform(rng, (batch_size, ps, ps, 3)) * 2 - 1,
        "post": jax.random.uniform(rng, (batch_size, ps, ps, 3)) * 2 - 1,
        "channels": jax.random.uniform(rng, (batch_size, ps, ps, 3)) * 2 - 1,
    }
    state, metrics = step(state, batch, rng)  # compile
    float(metrics["g_total_loss"])
    for i in range(5):  # steady-state warm
        state, metrics = step(state, batch, jax.random.fold_in(rng, 1000 + i))
    float(metrics["g_total_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    # data fetch forces true completion of the sequential state chain
    float(metrics["g_total_loss"])
    dt = time.perf_counter() - t0
    return steps * batch_size / dt


def bench_fullframe(frames: int = 30) -> dict:
    """The TPU-first one-pass mode (inference.mode=fullframe):
    streaming + compute-only (dispatch-difference)."""
    import jax
    import jax.numpy as jnp

    from patch_toon_tpu.infer.engine import make_fullframe_fn
    from patch_toon_tpu.models import GeneratorJ
    from patch_toon_tpu.utils.xla_options import resolve_xla_options

    h, w, c = 512, 910, 6
    gen = GeneratorJ(input_channels=c, use_bias=True, dtype=jnp.bfloat16)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 80, c)))
    fn = make_fullframe_fn(gen, h, w, c, jnp.bfloat16,
                           compiler_options=resolve_xla_options("auto"))
    rng = np.random.default_rng(0)
    frame_batch = [jnp.asarray(rng.random((h, w, c), np.float32) * 2 - 1)
                   for _ in range(3)]
    mask = jnp.ones((h, w, 1), jnp.float32)
    for i in range(4):
        np.asarray(fn(g_vars, frame_batch[i % 3], mask)[0])

    def queued(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(g_vars, frame_batch[i % 3], mask)
        np.asarray(out[0][0, 0, 0])
        return time.perf_counter() - t0

    # median-of-differences, big windows: see the tiled section's note —
    # max-of-differences inflates when one tiny-fetch sync lands fast
    n = max(8, frames)
    compute_fps = float(np.median(
        [n / max(queued(2 * n) - queued(n), 1e-9) for _ in range(3)]))

    from concurrent.futures import ThreadPoolExecutor

    fetch_pool = ThreadPoolExecutor(max_workers=6)

    def one_window() -> float:
        t0 = time.perf_counter()
        in_flight = []
        for i in range(frames):
            o, _ = fn(g_vars, frame_batch[i % 3], mask)
            try:
                o.copy_to_host_async()
            except Exception:
                pass
            in_flight.append(fetch_pool.submit(np.asarray, o))
            if len(in_flight) > 7:
                in_flight.pop(0).result()
        for f in in_flight:
            f.result()
        return frames / (time.perf_counter() - t0)

    # zero-compute ceiling interleaved with the arm (see the tiled section)
    def ceiling_window() -> float:
        outs = [fn(g_vars, frame_batch[i % 3], mask)[0]
                for i in range(frames)]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        in_flight = []
        for o in outs:
            in_flight.append(fetch_pool.submit(np.asarray, o))
            if len(in_flight) > 7:
                in_flight.pop(0).result()
        for f in in_flight:
            f.result()
        dt = time.perf_counter() - t0
        for o in outs:
            o.delete()
        return frames / dt

    ff_stream, ff_cap = _paired_windows(one_window, ceiling_window)
    return {"fullframe_streaming": round(ff_stream, 3),
            "fullframe_compute_only": round(compute_fps, 3),
            "fullframe_cap_fps": round(ff_cap, 3),
            "fullframe_vs_cap": round(ff_stream / ff_cap, 3)}


def bench_temporal(frames: int = 16) -> dict:
    """Temporal-guide serving with on-device flow — driven through the
    ENGINE'S OWN cycle helpers, not a re-implementation (VERDICT r3 #5:
    a hand-rolled bench loop can silently drift from the engine's
    orchestration, the r2 crop-bbox lesson):

    - streaming:     ``_process_directory_temporal`` — the real serving
                     loop (lookahead flow window, fused prep, band
                     fetches) over synthetic in-memory frames (file IO
                     stubbed: a no-op writer, a synthetic ``load_one``).
    - compute-only:  dispatch-difference over ``_chain_step`` + the
                     ``_temporal_flow_window`` lookahead — the same two
                     helpers the serving loop composes.
    - multi-stream:  ``_ms_run_cycles`` with ``_ms_load_frame`` stubbed —
                     the real cycle runner (co-batched flows + generator).
    """
    import tempfile
    from concurrent.futures import ThreadPoolExecutor
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer.engine import StyleTransferInference
    from patch_toon_tpu.infer.temporal import _temporal_flow_window
    from patch_toon_tpu.infer.tiling import tile_boxes_from_mask
    from patch_toon_tpu.train.checkpoints import CheckpointManager
    from patch_toon_tpu.train.model import StyleTransferModel

    h, w, ps = 512, 910, 80  # 3 RGB + 3 temporal-guide channels (c=6)
    rng = np.random.default_rng(0)
    host_u8 = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
               for _ in range(3)]
    ones = np.ones((h, w), np.float32)
    boxes = tile_boxes_from_mask(ones, ps, 30.0)

    tmp = Path(tempfile.mkdtemp(prefix="bench_temporal_"))
    (tmp / "out").mkdir()
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
        data_config=dict(patch_size=ps, additional_channels={}),
        perception_loss_config=None)
    state = model.init_state(jax.random.PRNGKey(0), patch_size=ps)
    CheckpointManager(
        tmp / "ckpt", meta={"input_channels": 6, "generator_args": g_args,
                            "patch_size": ps}).save(state, epoch=0,
                                                    score=1.0)

    class _BenchEngine(StyleTransferInference):
        """File IO stubbed for the multi-stream cycle runner; everything
        else is the shipped engine."""

        def _ms_load_frame(self, info, i):
            f = host_u8[i % 3]
            return (f, None, f, None, None, f"f{i:04d}.png", ones, boxes)

    repo = Path(__file__).resolve().parent

    def make_engine(extra=()):
        cfg = compose(repo / "config", "inference", overrides=[
            f"paths.checkpoint={tmp}/ckpt/last",
            f"paths.input_dir={tmp}",
            f"paths.mask_dir={tmp}/ignore",
            f"paths.output_dir={tmp}/out",
            "paths.additional_channels={}",
            f"data.patch_size={ps}",
            "+inference.temporal.enabled=true",
            "+inference.temporal.flow_source=device",
            "+inference.temporal.depth=3",
        ] + list(extra))
        return _BenchEngine(cfg)

    class _Writer:  # discard sink: bench measures serving, not PNG encode
        def submit(self, *a):
            pass

        def flush(self):
            return 0

        def close(self):
            pass

    eng = make_engine()

    def run_stream(e, n: int) -> float:
        """The engine's REAL single-stream serving loop over n synthetic
        frames; returns fps (fresh chain per window, like a CLI run)."""
        files = [tmp / f"f{i:04d}.png" for i in range(n)]

        def load_one(p):
            i = int(p.stem[1:])
            return (jax.device_put(host_u8[i % 3]), None, host_u8[i % 3],
                    None, boxes, None)

        e._temporal_prev = None
        e._temporal_prev_gray = None
        t0 = time.perf_counter()
        e._process_directory_temporal(files, load_one, tmp / "out",
                                      _Writer(), mask_dir=None,
                                      progress=False)
        return n / (time.perf_counter() - t0)

    run_stream(eng, 4)  # compile (bootstrap/window/chain programs) + warm
    run_stream(eng, 4)
    # Bidirectional zero-compute ceiling, interleaved with the arm: the
    # chain uploads the u8 RGB frame (load_one device_puts it inside the
    # timed loop) and fetches the u8 RGB result. Outputs must be
    # device-PRODUCED (a device_put keeps a cached host copy whose fetch
    # is free) — a trivial XOR program makes fresh ones.
    _mk_u8 = jax.jit(lambda x: x ^ 1)
    _base = jax.device_put(host_u8[0])
    np.asarray(_mk_u8(_base))  # compile
    pool6 = ThreadPoolExecutor(max_workers=6)

    def chain_ceiling() -> float:
        outs = [_mk_u8(jax.device_put(host_u8[i % 3]))
                for i in range(frames)]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        in_flight = []
        devs = []
        for i, o in enumerate(outs):
            devs.append(jax.device_put(host_u8[i % 3]))
            in_flight.append(pool6.submit(np.asarray, o))
            if len(in_flight) > 7:
                in_flight.pop(0).result()
        for f in in_flight:
            f.result()
        jax.block_until_ready(devs)
        dt = time.perf_counter() - t0
        for o in outs:
            o.delete()
        return frames / dt

    stream_fps, t_cap = _paired_windows(
        lambda: run_stream(eng, frames), chain_ceiling)

    # compute-only: dispatch-difference over the engine's _chain_step with
    # the _temporal_flow_window lookahead — the exact helper composition
    # the serving loop drives, minus host readback
    fdevs = [jax.device_put(f) for f in host_u8]
    K = eng.temporal_flow_batch

    def chain_compute(n: int) -> float:
        carry = (None, None)
        fcache = {}
        t0 = time.perf_counter()
        u8 = None
        for i in range(n):
            fdev = fdevs[i % 3]
            hit = fcache.pop(i, None)
            if hit is None and K > 1 and carry[1] is not None:
                js = list(range(i, min(i + K, n)))
                flows, grays = _temporal_flow_window(
                    jnp.stack([fdevs[j % 3] for j in js]), carry[1],
                    None, eng.temporal_flow_scale)
                for t, j in enumerate(js):
                    fcache[j] = (flows[t], grays[t])
                hit = fcache.pop(i)
            u8, _, carry = eng._chain_step(fdev, None, boxes, carry,
                                           flow_hit=hit)
        np.asarray(u8[0, 0, 0])  # tiny sync for dispatch-difference
        return time.perf_counter() - t0

    chain_compute(4)  # warm
    n = max(8, frames // 2)
    compute_fps = float(np.median(
        [n / max(chain_compute(2 * n) - chain_compute(n), 1e-9)
         for _ in range(3)]))

    # flow_scale=2: the knob-gated cheaper flow (half-res LK pyramid) —
    # streaming AND compute-only (the configuration that clears the
    # 25 fps chain-throughput bar when exact-scale flow isn't required)
    eng_fs2 = make_engine(["+inference.temporal.flow_scale=2"])
    run_stream(eng_fs2, 4)
    fs2_fps = max(run_stream(eng_fs2, frames) for _ in range(3))

    def chain_compute_fs2(n: int) -> float:
        carry = (None, None)
        t0 = time.perf_counter()
        u8 = None
        for i in range(n):
            u8, _, carry = eng_fs2._chain_step(fdevs[i % 3], None, boxes,
                                               carry)
        np.asarray(u8[0, 0, 0])
        return time.perf_counter() - t0

    chain_compute_fs2(4)  # warm
    fs2_compute = float(np.median(
        [n / max(chain_compute_fs2(2 * n) - chain_compute_fs2(n), 1e-9)
         for _ in range(3)]))

    # temporal x fullframe: the chain driving the whole-frame generator
    # program instead of gather/tiles/blend — the fast combination for
    # full-coverage masks (tests/test_temporal.py::test_temporal_fullframe
    # _mode proves byte-parity with the serving loop). ~21.5 ms/frame
    # generator vs ~35.7 for the 170-tile bucket-256 program
    # (docs/perf/chain_parts_r5.json).
    def chain_compute_eng(e, n: int) -> float:
        carry = (None, None)
        t0 = time.perf_counter()
        u8 = None
        for i in range(n):
            u8, _, carry = e._chain_step(fdevs[i % 3], None, boxes, carry)
        np.asarray(u8[0, 0, 0])
        return time.perf_counter() - t0

    ff_compute = {}
    for fs in (1, 2):
        e_ff = make_engine(["inference.mode=fullframe",
                            f"+inference.temporal.flow_scale={fs}"])
        chain_compute_eng(e_ff, 4)  # warm
        ff_compute[fs] = float(np.median(
            [n / max(chain_compute_eng(e_ff, 2 * n)
                     - chain_compute_eng(e_ff, n), 1e-9)
             for _ in range(3)]))

    # Multi-stream serving (subdirectory-per-video): 3 persistent chains,
    # flows AND generator co-batched per cycle — the engine's own
    # _ms_run_cycles with only the disk loader stubbed.
    S = 3

    def run_multi(e, cycles: int) -> float:
        infos = [dict(name=f"s{k}",
                      files=[tmp / f"s{k}" / f"f{i:04d}.png"
                             for i in range(cycles)],
                      chans={}, mdir=tmp, masked=False, fdir=None,
                      prev=None, prev_gray=None, idx=0, members=set())
                 for k in range(S)]
        load_pool = ThreadPoolExecutor(max_workers=2)
        fetch_pool = ThreadPoolExecutor(max_workers=6)
        t0 = time.perf_counter()
        try:
            e._ms_run_cycles(infos, _Writer(), load_pool, fetch_pool,
                             tmp / "out", [None], progress=False)
        finally:
            load_pool.shutdown(wait=False)
            fetch_pool.shutdown(wait=False)
        return S * cycles / (time.perf_counter() - t0)

    run_multi(eng, 3)  # compile + warm
    ms_fps = max(run_multi(eng, frames) for _ in range(3))
    print(f"[bench] temporal chain (device flow, engine-driven): streaming "
          f"{stream_fps:.1f} fps ({fs2_fps:.1f} at flow_scale=2; adjacent "
          f"bidir cap {t_cap:.1f}, ratio {stream_fps / t_cap:.2f}), "
          f"compute-only {compute_fps:.1f} fps ({fs2_compute:.1f} at "
          f"flow_scale=2, flow_batch={K}); fullframe compute-only "
          f"{ff_compute[1]:.1f} / {ff_compute[2]:.1f} fps (fs1/fs2); "
          f"multi-stream x{S} aggregate {ms_fps:.1f} fps", file=sys.stderr)
    return {"temporal_device_streaming": round(stream_fps, 3),
            "temporal_device_streaming_fs2": round(fs2_fps, 3),
            "temporal_cap_fps": round(t_cap, 3),
            "temporal_vs_cap": round(stream_fps / t_cap, 3),
            "temporal_device_compute_only": round(compute_fps, 3),
            "temporal_device_compute_only_fs2": round(fs2_compute, 3),
            "temporal_fullframe_compute_only": round(ff_compute[1], 3),
            "temporal_fullframe_compute_only_fs2": round(ff_compute[2], 3),
            "temporal_multistream3_aggregate_fps": round(ms_fps, 3)}


def main() -> None:
    from patch_toon_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    try:
        transport = bench_transport()
    except Exception as e:
        print(f"[bench] transport bench failed: {e}", file=sys.stderr)
        transport = {}
    tiled = bench_inference()
    try:
        pps = bench_training()
        print(f"[bench] training: {pps:,.0f} patches/sec", file=sys.stderr)
    except Exception as e:  # secondary metric must not break the bench line
        print(f"[bench] training bench failed: {e}", file=sys.stderr)
        pps = None
    try:
        ff = bench_fullframe()
        print(f"[bench] fullframe: {ff}", file=sys.stderr)
    except Exception as e:
        print(f"[bench] fullframe bench failed: {e}", file=sys.stderr)
        ff = {}
    try:
        tmp = bench_temporal()
    except Exception as e:
        print(f"[bench] temporal bench failed: {e}", file=sys.stderr)
        tmp = {}
    # Comparison bases (see BASELINE.md): the measured reference-equivalent
    # torch CPU throughput (0.052 frames/s tiled inference; 1.0 patches/s
    # training at the shipped default config) and the 30 fps north star.
    # The headline value is the PARITY (tiled) mode's streaming rate —
    # fullframe (relaxed IN semantics) is reported as a secondary metric.
    REF_FPS = 0.052
    REF_PPS = 1.0
    headline = tiled["tiled_streaming"]
    result = {
        "metric": "stylized_512p_frames_per_sec_per_chip_tiled_parity",
        "value": round(headline, 3),
        "unit": "frames/s",
        "vs_baseline": round(headline / REF_FPS, 1),
        "vs_northstar_30fps": round(headline / 30.0, 3),
        **transport,
        **tiled,
        **ff,
        **tmp,
    }
    if pps is not None:
        result["training_patches_per_sec"] = round(pps, 1)
        result["training_vs_reference"] = round(pps / REF_PPS, 1)
    # Tunnel congestion drifts DURING the run (sections are sequential;
    # BASELINE.md measured 5-10x day-to-day swings) — a second, short
    # probe at the end bounds the drift window, so a streaming number
    # above/below the start-of-run cap is explainable from the JSON alone.
    try:
        end = bench_transport(frames=4)
        result["transport_MBps_end"] = end["transport_concurrent6_MBps"]
        result["transport_bidir_cap_fps_end"] = end[
            "transport_bidir_cap_fps"]
    except Exception as e:
        print(f"[bench] end transport probe failed: {e}", file=sys.stderr)
    # how close the streaming headline runs to the wire's own ceiling —
    # ~1.0 means the pipeline is transport-saturated and only a faster
    # link (or fewer bytes) can raise the headline. Since r5 this ratio
    # comes from the matched probe measured ADJACENT to the winning tiled
    # arm (tiled_streaming_vs_cap) — r4's start/end-probe average could
    # not distinguish congestion drift (14.7->28.7 MB/s within one run)
    # from a streaming regression. The start/end global probes remain in
    # the JSON to bound whole-run drift.
    if "tiled_streaming_vs_cap" in tiled:
        result["streaming_vs_transport_cap"] = tiled[
            "tiled_streaming_vs_cap"]
    else:  # probe failed: fall back to the r4 start/end average
        caps = [transport.get("transport_cap_fps")]
        end_conc = result.get("transport_MBps_end")
        if end_conc:
            caps.append(end_conc / (512 * 910 * 3 / 1e6))  # probe frame MB
        caps = [c for c in caps if c]
        if caps:
            result["streaming_vs_transport_cap"] = round(
                headline / (sum(caps) / len(caps)), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
