#!/usr/bin/env python
"""D2H transport experiment: is the axon tunnel single-stream-limited?

VERDICT r2 #1b: the parity-streaming headline (20.4 fps) sits far below the
compute-only rate (49.8 fps) and the builder claims the gap is the
device->host tunnel. The one untried lever is CONCURRENT SLICED FETCHES:
split the uint8 frame into K row bands, fetch the K bands in parallel
(thread-per-band np.asarray, or async-queue-all-then-drain), reassemble
host-side. If the tunnel multiplexes streams, aggregate bandwidth
multiplies; if it is serialization-limited at a lower layer, K-way fetch
changes nothing and the negative result is recorded.

Methods, interleaved round-robin so congestion drift hits all equally
(the interleaved-minima methodology from tools/ab_xla_flags.py):

  single          one np.asarray of the whole frame
  async+fetch     copy_to_host_async first, then np.asarray
  sliceK_threads  K device row-band slices fetched by K threads
  sliceK_async    K slices: queue all copy_to_host_async, then asarray each
  window2/4       2 or 4 whole frames in flight, thread-pool drained

Run on the TPU machine:  python tools/profile_transport.py [--mb 1.4]
"""

from __future__ import annotations

import argparse
import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=910)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--out", default=None, help="write JSON here too")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    h, w = args.height, args.width
    mb = h * w * 3 / 1e6
    print(f"devices: {jax.devices()}  frame {h}x{w}x3 = {mb:.2f} MB")

    rng = np.random.default_rng(0)

    def fresh(n=1):
        a = [jnp.asarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
             for _ in range(n)]
        jax.block_until_ready(a)
        return a

    pool = ThreadPoolExecutor(max_workers=16)
    pool.map(lambda x: x, range(16))

    def m_single():
        (a,) = fresh()
        t0 = time.perf_counter()
        np.asarray(a)
        return time.perf_counter() - t0, mb

    def m_async():
        (a,) = fresh()
        t0 = time.perf_counter()
        a.copy_to_host_async()
        np.asarray(a)
        return time.perf_counter() - t0, mb

    def m_slice_threads(k):
        def run():
            (a,) = fresh()
            bands = [a[i * (h // k):(i + 1) * (h // k)] for i in range(k)]
            jax.block_until_ready(bands)
            t0 = time.perf_counter()
            list(pool.map(np.asarray, bands))
            return time.perf_counter() - t0, mb * (h // k) * k / h
        return run

    def m_slice_async(k):
        def run():
            (a,) = fresh()
            bands = [a[i * (h // k):(i + 1) * (h // k)] for i in range(k)]
            jax.block_until_ready(bands)
            t0 = time.perf_counter()
            for b in bands:
                try:
                    b.copy_to_host_async()
                except Exception:
                    pass
            for b in bands:
                np.asarray(b)
            return time.perf_counter() - t0, mb * (h // k) * k / h
        return run

    def m_window(n):
        def run():
            arrs = fresh(n)
            t0 = time.perf_counter()
            list(pool.map(np.asarray, arrs))
            return time.perf_counter() - t0, mb * n
        return run

    def m_window_slice(n, k):
        """n frames x k row-band slices each, all fetched concurrently."""
        def run():
            arrs = fresh(n)
            bands = [a[i * (h // k):(i + 1) * (h // k)]
                     for a in arrs for i in range(k)]
            jax.block_until_ready(bands)
            t0 = time.perf_counter()
            list(pool.map(np.asarray, bands))
            return time.perf_counter() - t0, mb * n * (h // k) * k / h
        return run

    # ---- H2D (upload) direction. The engine uploads fp32 frames with
    # C>=6 channels (engine._load_frame) — ~4.5x the bytes of the uint8
    # D2H fetch. If uploads ride the same tunnel limits, the upload is
    # the next wall after the concurrent drain; these methods bound it.
    def m_h2d(dtype, ch, n=1, conc=False):
        bytes_per = np.dtype(dtype).itemsize
        size_mb = h * w * ch * bytes_per / 1e6 * n

        def run():
            if np.dtype(dtype) == np.uint8:
                hosts = [rng.integers(0, 255, (h, w, ch), dtype=np.uint8)
                         for _ in range(n)]
            else:
                hosts = [rng.random((h, w, ch), dtype=np.float32)
                         for _ in range(n)]
            t0 = time.perf_counter()
            if conc:
                devs = list(pool.map(jnp.asarray, hosts))
            else:
                devs = [jnp.asarray(x) for x in hosts]
            jax.block_until_ready(devs)
            return time.perf_counter() - t0, size_mb
        return run

    methods = {
        "single": m_single,
        "async+fetch": m_async,
        "slice2_threads": m_slice_threads(2),
        "slice4_threads": m_slice_threads(4),
        "slice8_threads": m_slice_threads(8),
        "slice4_async": m_slice_async(4),
        "slice8_async": m_slice_async(8),
        "window2_threads": m_window(2),
        "window4_threads": m_window(4),
        "window6_threads": m_window(6),
        "window8_threads": m_window(8),
        "window4_slice2": m_window_slice(4, 2),
        "window4_slice4": m_window_slice(4, 4),
        "h2d_f32c6": m_h2d(np.float32, 6),
        "h2d_u8c6": m_h2d(np.uint8, 6),
        "h2d_u8c3": m_h2d(np.uint8, 3),
        "h2d_f32c6_w4": m_h2d(np.float32, 6, n=4, conc=True),
        "h2d_u8c6_w4": m_h2d(np.uint8, 6, n=4, conc=True),
    }

    # warm every path once (slice programs compile on first use)
    for fn in methods.values():
        fn()

    times: dict = {k: [] for k in methods}
    sizes: dict = {}
    for r in range(args.reps):
        for name, fn in methods.items():
            dt, size = fn()
            times[name].append(dt)
            sizes[name] = size

    result = {}
    print(f"\n{'method':<18}{'min MB/s':>10}{'med MB/s':>10}{'max ms':>9}")
    for name in methods:
        ts = times[name]
        best = sizes[name] / min(ts)
        med = sizes[name] / float(np.median(ts))
        print(f"{name:<18}{best:>10.1f}{med:>10.1f}"
              f"{1e3 * max(ts):>9.1f}")
        result[name] = {"MBps_best": round(best, 1),
                        "MBps_median": round(med, 1),
                        "MB": round(sizes[name], 2)}
    pool.shutdown(wait=False)

    single = result["single"]["MBps_median"]
    best_name = max(result, key=lambda k: result[k]["MBps_median"])
    print(f"\nsingle-stream median {single} MB/s; best method {best_name} "
          f"({result[best_name]['MBps_median']} MB/s, "
          f"{result[best_name]['MBps_median'] / max(single, 1e-9):.2f}x)")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
