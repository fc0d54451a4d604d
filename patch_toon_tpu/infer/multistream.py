"""Multi-stream temporal serving: N interleaved warp chains on one chip.

Split out of ``infer.engine`` (r4, VERDICT r3 #3). A single warp chain is
inherently sequential (frame i needs frame i-1's stylized output), so one
stream can't co-batch its own frames; N streams break that limit — each
cycle stylizes every live stream's next frame in ONE co-batched multiframe
dispatch (see ``_ms_run_cycles``). No reference equivalent (reference
generator.py is one-shot, one directory).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.data.io import find_corresponding_image
from patch_toon_tpu.infer.common import (
    _image_files,
    compute_crop_bbox,
    mask_support_bbox,
)
from patch_toon_tpu.infer.temporal import (
    _device_gray,
    _packed_ones_mask,
    _temporal_device_flow,
    _temporal_flow_pairs,
    _temporal_prep,
)
from patch_toon_tpu.infer.tiling import tile_boxes_from_mask


class MultiStreamMixin:
    """Multi-stream temporal serving methods of ``StyleTransferInference``
    (layout detection, per-stream state, the cycle runner, one-shot and
    watch drivers)."""

    def _detect_streams(self, input_dir: Path) -> List[str]:
        """Subdirectory-per-video layout for multi-stream temporal serving:
        input_dir holds no images itself but >= 1 subdirectory that does."""
        if _image_files(input_dir):
            return []
        try:
            subdirs = list(input_dir.iterdir())
        except (FileNotFoundError, NotADirectoryError):
            return []  # input dir removed mid-watch: go quiet, don't crash
        return sorted(
            d.name for d in subdirs if d.is_dir() and _image_files(d))

    def _ms_info(self, name: str, files, mask_dir: Path, flow_root):
        """Per-stream serving state: the file queue, per-stream aux dirs,
        the warp-chain carry (prev stylized output / prev grayscale), and
        the set of known stream members. Files-mode flows are indexed by a
        frame's RANK in the sorted member set — the multi-stream form of
        _temporal_position, so watch retries/restarts keep positions."""
        chans = {n: dict(c, path=str(Path(c["path"]) / name))
                 for n, c in self.additional_channels.items()}
        mdir = mask_dir / name
        masked = not mask_dir.name.endswith("ignore")
        if masked and not mdir.exists():
            raise FileNotFoundError(f"Mask directory not found: {mdir}")
        return dict(name=name, files=list(files), chans=chans, mdir=mdir,
                    masked=masked,
                    fdir=(flow_root / name) if flow_root else None,
                    prev=None, prev_gray=None, idx=0,
                    members={p.name for p in files})

    def _ms_load_frame(self, info, i: int):
        """Decode one stream frame + its mask/aux (worker-thread side).

        The aux slot carries the mode's wire payload: the raw (>127) flow
        mask for flow_source=device (bit-packed when mask_upload=packed),
        or the flow_dir/<stream>/{pos}.npy field for files mode, resolved
        by the frame's member rank — equal to its sorted-list index in a
        one-shot run, and stable across watch polls and retries."""
        from PIL import Image

        p = info["files"][i]
        frame, rgb_u8 = self._load_frame(
            str(p), with_rgb_u8=True, channels=info["chans"])
        mask = None
        if info["masked"]:
            mask = self._load_eroded_mask(
                str(info["mdir"] / p.name), frame.shape[:2])
        mbox = mask_support_bbox(mask) if mask is not None else None
        aux = None
        if self.temporal_flow_source == "device":
            # raw flow mask, the TOOL's semantics (> 127); missing ->
            # unmasked flow — mirrors the single-stream load_flow_mask
            resolved = find_corresponding_image(str(info["mdir"]), p.name)
            if os.path.exists(resolved):
                arr = np.asarray(Image.open(resolved).convert("L"))
                aux = np.packbits(arr > 127) if self.mask_packed \
                    else (arr > 127).astype(np.uint8)
        elif info["fdir"] is not None:
            pos = sorted(info["members"]).index(p.name)
            fp = info["fdir"] / f"{self.temporal_format % pos}.npy"
            if fp.exists():
                aux = np.load(str(fp))
                if self.temporal_flow_f16 and aux.dtype != np.float16:
                    aux = aux.astype(np.float16)
        # tile layout on the worker thread too — the nonzero walk is pure
        # host work that has no place on the sequential cycle thread
        eff = mask if mask is not None else np.ones(frame.shape[:2],
                                                    np.float32)
        boxes = tile_boxes_from_mask(eff, self.patch_size,
                                     self.overlap_percent)
        return frame, mask, rgb_u8, mbox, aux, p.name, eff, boxes

    def _ms_drain_one(self, pending, writer) -> None:
        """Resolve the oldest pending readback and hand it to the writer
        (host-side crop paste + debug overlay included). A failed fetch is
        logged, never raised — cycles are independent dispatches."""
        fut, save_path, crop, boxes = pending.pop(0)
        try:
            arr = fut.result()
        except Exception as e:
            self.logger.error(f"Readback failed for "
                              f"{Path(save_path).name}: {e}")
            return
        if crop is not None:
            (y0, y1, x0, x1), rgb_u8 = crop
            img = rgb_u8.copy()
            img[y0:y1, x0:x1] = arr
        else:
            img = arr
        writer.submit(str(save_path), img)
        if self.debug_mode:
            self.patch_positions = boxes
            self._save_debug_overlay(img, str(save_path))

    def _ms_resolve_loads(self, subs, shape_ref) -> List[dict]:
        """Cycle pass 1: resolve the worker-thread loads and upload each
        stream's frame; a failed decode restarts only its own chain. The
        first resolved frame pins the one compiled resolution
        (``shape_ref``)."""
        loaded = []
        for info, fut in subs:
            try:
                (frame, mask, rgb_u8, mbox, aux, fname, eff,
                 boxes) = fut.result()
                if shape_ref[0] is None:
                    shape_ref[0] = frame.shape
                elif frame.shape != shape_ref[0]:
                    raise ValueError(
                        f"stream {info['name']} is "
                        f"{frame.shape[:2]}, others "
                        f"{shape_ref[0][:2]} — all streams must share "
                        "one resolution")
                loaded.append(dict(
                    info=info, fdev=jnp.asarray(frame), mask=mask,
                    rgb_u8=rgb_u8, mbox=mbox, aux=aux, fname=fname,
                    eff=eff, boxes=boxes))
            except Exception as e:
                self.logger.error(
                    f"Failed to process {info['name']} frame: {e}")
                info["prev"] = info["prev_gray"] = None  # restart
        return loaded

    def _ms_cycle_flow_hits(self, loaded, shape_ref) -> Dict[int, tuple]:
        """Cycle pass 2 (device flow): optionally co-batch the cycle's LK
        flows into ONE vmapped dispatch across streams. Measured NEGATIVE
        on v5e (docs/perf/flow_batch_r4.json: vmapped LK is 0.70-0.85x
        sequential per-flow at every batch size — the batch's 3-D gathers
        lose to K 2-D ones), so per-stream dispatches are the default;
        flow_batch>1 opts in for transports where dispatch latency
        dominates device time."""
        flow_hits: Dict[int, tuple] = {}
        if self.temporal_flow_source != "device" \
                or self.temporal_flow_batch <= 1:
            return flow_hits
        live = [k for k, e in enumerate(loaded)
                if e["info"]["prev"] is not None
                and e["info"]["prev_gray"] is not None]
        if len(live) > 1:
            h_, w_ = shape_ref[0][:2]
            auxs = [loaded[k]["aux"] for k in live]
            if all(a is None for a in auxs):
                fmasks = None
            else:
                ones = _packed_ones_mask(h_, w_) \
                    if self.mask_packed \
                    else np.ones((h_, w_), np.uint8)
                fmasks = jnp.asarray(np.stack(
                    [ones if a is None else a for a in auxs]))
            flows, grays = _temporal_flow_pairs(
                jnp.stack([loaded[k]["fdev"] for k in live]),
                jnp.stack([loaded[k]["info"]["prev_gray"]
                           for k in live]),
                fmasks, self.temporal_flow_scale)
            for t, k in enumerate(live):
                flow_hits[k] = (flows[t], grays[t])
        return flow_hits

    def _ms_cycle_prologue(self, loaded, flow_hits) -> List[tuple]:
        """Cycle pass 3: per-stream temporal prologue — on-device flow (or
        the files-mode flow upload) + fused warp/guide-concat, exactly the
        single-stream dispatches. A failed prologue restarts only its own
        chain."""
        device_flow = self.temporal_flow_source == "device"
        batch = []
        for k, e in enumerate(loaded):
            info, fdev, aux, fname = \
                e["info"], e["fdev"], e["aux"], e["fname"]
            try:
                if device_flow:
                    if info["prev"] is not None and \
                            info["prev_gray"] is not None:
                        hit = flow_hits.get(k)
                        if hit is not None:
                            flow_in, gray = hit
                        else:
                            fmask = None if aux is None else \
                                jnp.asarray(aux)
                            flow_in, gray = _temporal_device_flow(
                                fdev, info["prev_gray"], fmask,
                                self.temporal_flow_scale)
                        prev_in = info["prev"]
                    else:
                        gray = _device_gray(fdev)
                        prev_in, flow_in = None, None  # bootstrap
                else:
                    gray = None
                    if info["prev"] is None or info["fdir"] is None:
                        prev_in, flow_in = None, None
                    elif aux is not None:
                        prev_in, flow_in = info["prev"], \
                            jnp.asarray(aux)
                    else:
                        self.logger.warning(
                            f"No flow for {info['name']}/{fname}; "
                            f"using unwarped previous output")
                        prev_in, flow_in = info["prev"], None
                full = _temporal_prep(fdev, prev_in, flow_in,
                                      self.temporal_depth)
                batch.append((info, full, e["eff"], e["boxes"],
                              e["rgb_u8"], e["mbox"], gray, fname))
            except Exception as exc:
                self.logger.error(
                    f"Failed to process {info['name']} frame: {exc}")
                info["prev"] = info["prev_gray"] = None  # restart
        return batch

    def _ms_dispatch_cycle(self, batch, pending, fetch_pool,
                           output_dir: Path, writer, shape_ref, bar,
                           max_pending: int) -> None:
        """Cycle pass 4: stylize ALL streams' prepared frames in ONE
        co-batched multiframe dispatch, advance each chain's carry, submit
        per-frame (optionally cropped) readbacks, and drain past the
        in-flight bound."""
        device_flow = self.temporal_flow_source == "device"
        if len(batch) == 1:
            _i, full, eff, boxes, *_ = batch[0]
            u8b, outf, _ = self._stylize_device(full, eff, boxes=boxes)
            u8s, outs = [u8b], [outf]
        else:
            u8b, outb = self._stylize_group(
                [b[1] for b in batch], [b[2] for b in batch],
                [b[3] for b in batch])
            u8s = [u8b[k] for k in range(len(batch))]
            outs = [outb[k] for k in range(len(batch))]
        for k, (info, full, eff, boxes, rgb_u8, mbox, gray,
                fname) in enumerate(batch):
            info["prev"] = outs[k]
            if device_flow:
                info["prev_gray"] = gray
            u8 = u8s[k]
            crop = None
            if self.crop_readback and mbox is not None:
                bbox = compute_crop_bbox([mbox], *shape_ref[0][:2])
                if bbox is not None:
                    y0, y1, x0, x1 = bbox
                    u8 = u8[y0:y1, x0:x1]
                    crop = (bbox, rgb_u8)
            try:
                u8.copy_to_host_async()
            except Exception:
                pass
            pending.append((
                fetch_pool.submit(np.asarray, u8),
                output_dir / info["name"] / fname, crop, boxes))
            bar.update(1)
        # keep enough fetches in flight to multiplex the wire,
        # drain the rest so memory stays bounded
        while len(pending) > max_pending:
            self._ms_drain_one(pending, writer)

    def _ms_run_cycles(self, infos, writer, load_pool, fetch_pool,
                       output_dir: Path, shape_ref,
                       progress: bool = True) -> None:
        """Drain every stream's file queue as interleaved chain cycles.

        Each cycle takes the next frame from every live stream, runs the
        per-stream temporal prologue (on-device flow + fused warp/concat —
        exactly the single-stream dispatches), then stylizes ALL streams'
        frames in ONE co-batched multiframe dispatch while every stream's
        uint8 readback drains concurrently over the fetch pool. Chains
        never mix: stream k's guide warps stream k's own previous output.
        Chain state (prev/prev_gray) lives on the info dicts, so a caller
        that keeps them (_watch_multistream) carries chains across calls;
        shape_ref pins the one compiled resolution the same way. All
        pending readbacks are drained before returning. The four passes
        live in ``_ms_resolve_loads`` / ``_ms_cycle_flow_hits`` /
        ``_ms_cycle_prologue`` / ``_ms_dispatch_cycle``."""
        from tqdm import tqdm

        pending = []  # (fetch future, save path, crop, boxes)
        total = sum(len(i["files"]) - i["idx"] for i in infos)
        bar = tqdm(total=total, desc="Temporal frames (multi-stream)",
                   disable=not progress)

        def submit_loads():
            return [(info,
                     load_pool.submit(self._ms_load_frame, info,
                                      info["idx"]))
                    for info in infos if info["idx"] < len(info["files"])]

        subs = submit_loads()
        try:
            while subs:
                for info, _ in subs:
                    info["idx"] += 1
                next_subs = submit_loads()  # next cycle rides the load pool
                loaded = self._ms_resolve_loads(subs, shape_ref)
                flow_hits = self._ms_cycle_flow_hits(loaded, shape_ref)
                batch = self._ms_cycle_prologue(loaded, flow_hits)
                if batch:
                    self._ms_dispatch_cycle(
                        batch, pending, fetch_pool, output_dir, writer,
                        shape_ref, bar,
                        max_pending=self.readback_streams + len(infos))
                subs = next_subs
        finally:
            # graceful shutdown: pending fetches drain (_ms_drain_one logs
            # a failed fetch itself) and the bar closes even when an
            # interrupt lands mid-cycle — chain carries stay on the info
            # dicts, so a watch caller resumes cleanly
            while pending:
                self._ms_drain_one(pending, writer)
            bar.close()

    def _process_multistream(self, streams, input_dir: Path,
                             mask_dir: Path, output_dir: Path,
                             progress: bool = True) -> None:
        """Serve N independent videos (one subdirectory each) as
        interleaved temporal chains on ONE chip.

        A single warp chain is inherently sequential — frame i needs frame
        i-1's stylized output — so one stream can't co-batch its own frames
        (the 512p tile bucket runs 170/256 = 66% full) and its readback
        gaps leave the wire idle. N streams break both limits: see
        _ms_run_cycles (byte-parity vs N separate single-stream runs:
        tests/test_temporal.py::test_multistream_*).

        Layout: paths.input_dir/<stream>/*.png, masks at
        paths.mask_dir/<stream>/, guide channels at <channel.path>/
        <stream>/, flows (flow_source=files) at temporal.flow_dir/
        <stream>/; outputs land in paths.output_dir/<stream>/. All streams
        must share one resolution (one compiled program serves every
        cycle). Multi-host runs shard whole STREAMS round-robin per
        process (chains are per-stream state, so hosts need no
        communication). Watch mode serves the same layout via
        _watch_multistream."""
        from concurrent.futures import ThreadPoolExecutor

        from patch_toon_tpu.native import FrameWriter

        if self.devices != 1:
            raise ValueError(
                "multi-stream temporal serving is per-chip (inference."
                "devices=1); run one process per chip and shard streams")
        if jax.process_count() > 1:
            streams = streams[jax.process_index()::jax.process_count()]
            self.logger.info(
                f"Multi-host: this process serves streams {streams}")
        flow_root = Path(self.temporal_flow_dir) \
            if self.temporal_flow_dir else None

        infos = []
        for s in streams:
            files = _image_files(input_dir / s)
            infos.append(self._ms_info(s, files, mask_dir, flow_root))
            (output_dir / s).mkdir(parents=True, exist_ok=True)
        total = sum(len(i["files"]) for i in infos)
        self.logger.info(
            f"Multi-stream temporal serving: {len(infos)} streams, "
            f"{total} frames, co-batched {len(infos)} frames/dispatch")

        writer = FrameWriter(num_threads=2)
        load_pool = ThreadPoolExecutor(max_workers=2)
        fetch_pool = ThreadPoolExecutor(
            max_workers=max(4, min(8, self.readback_streams)))
        try:
            self._ms_run_cycles(infos, writer, load_pool, fetch_pool,
                                output_dir, [None], progress=progress)
        finally:
            load_pool.shutdown(wait=False)
            fetch_pool.shutdown(wait=False)
            failed = writer.flush()
            writer.close()
            if failed:
                self.logger.error(f"{failed} frame writes failed")

    def _watch_multistream(self, wcfg) -> None:
        """Watch-serve N videos (paths.input_dir/<stream>/*.png) as
        persistent interleaved temporal chains on one chip.

        The multi-stream analogue of watch_directory (no reference
        equivalent — generator.py is one-shot): each poll picks up settled
        new frames per stream IN ORDER — a frame whose mask/guide channels
        haven't landed blocks its OWN stream (chains advance sequentially)
        but never the others — then every stream's new frames run through
        the co-batched cycle runner. Chain state, stream flow positions,
        the compiled-resolution pin and warm programs persist across
        polls; new stream subdirectories join live (once their mask dir
        exists, when masks are required). Multi-host runs shard whole
        streams by a stable name hash. Frames already stylized at start
        keep their stream positions (their outputs register them), so a
        service restart over a half-served directory resumes every
        chain's flow indexing correctly — the chain itself restarts from
        the first new frame's RGB bootstrap, exactly like single-stream
        watch."""
        import time as _time
        import zlib
        from concurrent.futures import ThreadPoolExecutor

        from patch_toon_tpu.native import FrameWriter

        if self.devices != 1:
            raise ValueError(
                "multi-stream temporal serving is per-chip (inference."
                "devices=1); run one process per chip and shard streams")
        poll = float(wcfg.get("poll_seconds", 1.0))
        idle_timeout = float(wcfg.get("idle_timeout_seconds") or 0)
        max_attempts = int(wcfg.get("max_attempts", 3))
        aux_warn_after = float(wcfg.get("aux_warn_seconds", 30.0))
        input_dir = Path(self.cfg.paths.input_dir)
        output_dir = Path(self.cfg.paths.output_dir)
        mask_dir = Path(self.cfg.paths.mask_dir)
        mask_needed = not mask_dir.name.endswith("ignore")
        flow_root = Path(self.temporal_flow_dir) \
            if self.temporal_flow_dir else None
        nproc, me = jax.process_count(), jax.process_index()

        writer = FrameWriter(num_threads=2)
        load_pool = ThreadPoolExecutor(max_workers=2)
        fetch_pool = ThreadPoolExecutor(
            max_workers=max(4, min(8, self.readback_streams)))
        shape_ref = [None]
        infos: Dict[str, dict] = {}
        done: Dict[str, set] = {}
        attempts: Dict[str, int] = {}
        waiting_since: Dict[str, float] = {}
        aux_warned: set = set()

        def aux_ready(info, p: Path) -> bool:
            if info["masked"] and not os.path.exists(
                    find_corresponding_image(str(info["mdir"]), p.name)):
                return False
            for ccfg in info["chans"].values():
                if not os.path.exists(
                        find_corresponding_image(ccfg["path"], str(p))):
                    return False
            return True

        idle = 0.0
        self.logger.info(
            f"Watching {input_dir} (multi-stream temporal, poll {poll}s, "
            f"idle timeout {idle_timeout or 'none'})")
        try:
            while True:
                now = _time.time()
                for s in self._detect_streams(input_dir):
                    if s in infos or (nproc > 1 and
                                      zlib.crc32(s.encode()) % nproc != me):
                        continue
                    if mask_needed and not (mask_dir / s).exists():
                        continue  # producer hasn't created it yet
                    info = self._ms_info(s, [], mask_dir, flow_root)
                    (output_dir / s).mkdir(parents=True, exist_ok=True)
                    prior = {q.name for q in
                             _image_files(output_dir / s)}
                    info["members"] |= prior  # keep restart positions
                    done[s] = set(prior)
                    infos[s] = info
                    self.logger.info(
                        f"Stream {s}: serving" + (
                            f" ({len(prior)} already stylized)"
                            if prior else ""))
                new_total = 0
                for s, info in infos.items():
                    fresh = []
                    for p in _image_files(input_dir / s):
                        if p.name in done[s] \
                                or (output_dir / s / p.name).exists():
                            info["members"].add(p.name)
                            done[s].add(p.name)
                            continue
                        key = f"{s}/{p.name}"
                        try:
                            if p.stat().st_mtime > now - max(0.25,
                                                             poll / 2):
                                break  # settling: chain order, stream waits
                        except OSError:
                            break
                        info["members"].add(p.name)
                        if not aux_ready(info, p):
                            first = waiting_since.setdefault(key, now)
                            if key not in aux_warned \
                                    and now - first >= aux_warn_after:
                                aux_warned.add(key)
                                self.logger.warning(
                                    f"{key}: mask/guide channels still "
                                    f"missing after {now - first:.0f}s; "
                                    "its stream stays blocked until they "
                                    "arrive")
                            break  # chain order: only THIS stream blocks
                        waiting_since.pop(key, None)
                        aux_warned.discard(key)
                        fresh.append(p)
                    info["files"] = fresh
                    info["idx"] = 0
                    new_total += len(fresh)
                if new_total:
                    try:
                        self._ms_run_cycles(
                            list(infos.values()), writer, load_pool,
                            fetch_pool, output_dir, shape_ref,
                            progress=False)
                    except Exception as e:
                        # the service must outlive a bad batch; per-frame
                        # attempts below decide retry vs give-up
                        self.logger.error(f"Batch failed: {e}")
                    writer.flush()
                    for s, info in infos.items():
                        for p in info["files"]:
                            key = f"{s}/{p.name}"
                            if (output_dir / s / p.name).exists():
                                done[s].add(p.name)
                                idle = 0.0
                            else:
                                attempts[key] = attempts.get(key, 0) + 1
                                if attempts[key] >= max_attempts:
                                    self.logger.error(
                                        f"Giving up on {key} after "
                                        f"{max_attempts} attempts")
                                    done[s].add(p.name)
                    self.logger.info(
                        f"Stylized {new_total} new frame(s) across "
                        f"{len(infos)} stream(s)")
                _time.sleep(poll)
                idle += poll
                if idle_timeout and idle >= idle_timeout:
                    self.logger.info(
                        f"No new frames for {idle:.0f}s; stopping watch")
                    return
        except KeyboardInterrupt:
            # graceful shutdown (Ctrl-C / SIGTERM): _ms_run_cycles drains
            # its pending readbacks in its own finally; the finally below
            # flushes the writer queue — dispatched frames reach disk
            self.logger.info(
                "Multi-stream watch interrupted; pending frames flushed, "
                "shutting down")
            return
        finally:
            load_pool.shutdown(wait=False)
            fetch_pool.shutdown(wait=False)
            failed = writer.flush()
            writer.close()
            if failed:
                self.logger.error(f"{failed} frame writes failed")
