"""Whole-frame tiled inference engine.

TPU-native rebuild of the reference ``StyleTransferInference``
(generator.py:18-705). The reference loops tiles one-by-one through the
generator in Python (generator.py:500-515 — the performance cliff); here a
frame is one compiled program: gather ALL tiles with a vmapped dynamic_slice,
run the generator over the whole tile batch on the MXU (bf16 by default,
fp32 accumulation), scatter-accumulate with the Gaussian windows via
lax.scan, normalize, composite with the eroded mask, and convert to uint8 —
all inside one jit per (frame-size, tile-bucket) signature.

Semantics preserved from the reference:
- checkpoint channel sniff (generator.py:115-129) — works for both this
  build's orbax checkpoints and reference torch ``.ckpt`` files;
- mask threshold 0.4 + 7x7 full-support erosion (generator.py:327-351);
- tile grid from the eroded mask's nonzero list (generator.py:353-398);
- center-padding of clipped edge tiles (generator.py:467-498) and the
  top-left-anchored scatter of the generator output (generator.py:541-547);
- Gaussian window on the clipped box, bilinearly resized to the patch size
  (generator.py:527-539);
- weight-normalized blend + mask composite (generator.py:557-563);
- uint8 conversion (generator.py:643-652), per-file error resilience
  (generator.py:700-705), debug patch-rectangle overlay (generator.py:301-325).
"""

from __future__ import annotations

import functools
import logging
import os
import threading
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.data.io import (
    find_corresponding_image,
    list_images,
    load_image_channels,
    load_mask,
    save_image_uint8,
)
from patch_toon_tpu.infer.tiling import (
    Box,
    bucket_size,
    frames_per_dispatch,
    pack_boxes,
    tile_boxes_from_mask,
)
from patch_toon_tpu.ops.masks import erode_full_support_np
from patch_toon_tpu.utils.logging import configure_logging
from patch_toon_tpu.train.checkpoints import sniff_input_channels
from patch_toon_tpu.train.model import StyleTransferModel, _resolve_dtype

# Serving-mode modules split out in r4 (VERDICT r3 #3). ``engine`` remains
# the import surface: every helper and program builder is re-exported here
# (tests/tools/bench import them from this module).
from patch_toon_tpu.infer.common import (  # noqa: F401  (re-exports)
    _composite_u8,
    _from_gather_repr,
    _gather_repr,
    _image_files,
    _mask_f32,
    _parse_crop_knob,
    _to_signed_unit,
    compute_crop_bbox,
    mask_support_bbox,
    upload_crop_window,
)
from patch_toon_tpu.infer.multistream import MultiStreamMixin
from patch_toon_tpu.infer.programs import (  # noqa: F401  (re-exports)
    _frame_body,
    _multiframe_body,
    make_batched_fullframe_fn,
    make_frame_fn,
    make_fullframe_fn,
    make_multiframe_fn,
    make_pod_multiframe_fn,
    make_pod_tiled_fn,
)
from patch_toon_tpu.infer.temporal import (  # noqa: F401  (re-exports)
    TemporalMixin,
    _device_gray,
    _temporal_device_flow,
    _temporal_prep,
)
from patch_toon_tpu.infer.watch import WatchMixin


class StyleTransferInference(TemporalMixin, MultiStreamMixin,
                             WatchMixin):
    def __init__(self, cfg: Any):
        self.cfg = cfg
        inf = cfg.get("inference", {})
        self.debug_mode = bool(inf.get("debug_mode", False))
        self.mode = str(inf.get("mode", "tiled"))  # tiled (parity) | fullframe
        self.overlap_percent = float(inf.get("overlap_percent", 30.0))
        # co-batch budget: 'auto' frames_per_dispatch fills (but never
        # exceeds) this many tiles per dispatch. 512 is the measured
        # per-real-tile optimum on v5e (docs/perf/bucket_sweep_r3.json:
        # 512@109 vs 1024@112 us/tile, and bigger dispatches coarsen the
        # readback granularity).
        self.max_tile_batch = int(inf.get("tile_batch", 512))
        tcfg = inf.get("temporal") or {}
        self.temporal_enabled = bool(tcfg.get("enabled", False))
        self.temporal_flow_dir = tcfg.get("flow_dir")
        self.temporal_depth = int(tcfg.get("depth", 3))
        self.temporal_format = str(tcfg.get("file_format", "%03d"))
        # flow_source=device: derive the backward flow ON DEVICE from the
        # already-uploaded frames (ops.flow pyramidal LK over bit-exact
        # PIL-luma grayscale — the same computation tools/optical_flow.py
        # backend="tpu" writes to .npy), eliminating both the flow upload
        # (the largest temporal-mode H2D transfer) and the offline
        # preprocessing pass. "files" reads flow_dir .npy (default).
        self.temporal_flow_source = str(
            tcfg.get("flow_source", "files")).lower()
        if self.temporal_flow_source not in ("files", "device"):
            raise ValueError(
                f"inference.temporal.flow_source="
                f"{self.temporal_flow_source!r}: expected files/device")
        # flow_scale (device source only): LK on a 2x/4x-downsampled
        # pyramid, displacements upsampled — ~3x cheaper flow for guides
        # that don't need sub-pixel accuracy; 1 = the tool's exact flow
        self.temporal_flow_scale = int(tcfg.get("flow_scale", 1))
        if self.temporal_flow_scale not in (1, 2, 4):
            raise ValueError(
                f"inference.temporal.flow_scale="
                f"{self.temporal_flow_scale!r}: expected 1, 2 or 4")
        # flow_batch (device source): lookahead window of frames whose
        # backward flows compute in ONE vmapped LK dispatch ahead of the
        # sequential chain (temporal._temporal_flow_window — flows depend
        # only on input grays, so they batch; byte-identical on CPU, and
        # value-equal within LK's own iteration roundoff on TPU).
        # MEASURED NEGATIVE on v5e (tools/profile_flow_batch.py,
        # docs/perf/flow_batch_r4.json): vmapped LK is 0.70-0.85x the
        # per-flow rate of sequential dispatches at EVERY K in 2-8 and both
        # flow scales — LK is gather-descriptor-bound and the batch's 3-D
        # gathers are slower than K sequential 2-D ones. "auto" therefore
        # resolves to 1 (per-frame); the knob remains for transports where
        # per-dispatch latency dominates device time.
        fb_raw = str(tcfg.get("flow_batch", "auto")).lower()
        if fb_raw == "auto":
            self.temporal_flow_batch = 1
        else:
            self.temporal_flow_batch = int(fb_raw)
            if not 1 <= self.temporal_flow_batch <= 16:
                raise ValueError(
                    f"inference.temporal.flow_batch={fb_raw!r}: "
                    "expected auto or an int in [1, 16]")
        # resolved below once self.upload_u8 is known ("auto" follows it)
        self._temporal_flow_upload = str(
            tcfg.get("flow_upload", "auto")).lower()
        # single source for the inference precision: self.dtype (tile/frame
        # compute) and the model's conv-precision policy (_setup_model) must
        # read the SAME value or an fp32-trained checkpoint would pay
        # HIGHEST-precision convs on bf16-truncated inputs
        self.precision = inf.get("precision", "bf16")
        self.dtype = _resolve_dtype(self.precision) or jnp.float32
        # inference.quantize: "int8" serves every generator conv (except
        # the 1x1 output head) as w8a8 on the int8 MXU (models/layers.py
        # QuantConv; measured throughput in the QuantConv docstring —
        # a wash under the shipped tuned XLA options). Activation scales
        # calibrate automatically on the first frame (one fp forward).
        # A throughput/quality knob, NOT bit-parity; off by default.
        q = str(inf.get("quantize", "off")).lower()
        if q in ("off", "false", "0", "no", "none"):
            self.quantize = None
        elif q in ("int8", "w8a8"):
            self.quantize = "int8"
        else:
            raise ValueError(
                f"inference.quantize={q!r}: expected int8/w8a8 or "
                "off/false/0/no/none")
        # inference.devices: 1 = single chip; N = frames sharded over an
        # N-chip 'data' mesh (pod streaming); -1 = all chips
        self.devices = int(inf.get("devices", 1))
        # crop the D2H readback to the stylized (mask-support) bbox; outside
        # the mask the composite equals the input bytes exactly, so the
        # frame is reconstructed host-side bit-identically. Big win on
        # slow/congested transports when the mask covers part of the frame.
        self.crop_readback = _parse_crop_knob(
            inf.get("crop_readback", "auto"))
        # inference.crop_upload: crop frame+mask to the (bucketed) tile
        # read-union window BEFORE upload in masked tiled runs — cuts BOTH
        # wire directions, bit-identically (see upload_crop_window).
        # "auto" (default) follows crop_readback, so crop_readback=off
        # still means full frames end-to-end; "on" forces it regardless.
        cu_raw = str(inf.get("crop_upload", "auto")).lower()
        if cu_raw == "auto":
            self.crop_upload = self.crop_readback
        else:
            self.crop_upload = _parse_crop_knob(cu_raw, knob="crop_upload")
        # concurrent D2H fetch streams: the axon tunnel (and remote
        # transports generally) multiplex — 6 thread-fetches measured 2.1x
        # one serial fetch's bandwidth, saturating near 6-8 streams
        # (tools/profile_transport.py, docs/perf/transport_r3.json).
        # 1 = serial drain.
        self.readback_streams = max(1, int(inf.get("readback_streams", 6)))
        # inference.upload: u8 uploads frames/masks as uint8 and normalizes
        # on-device (4x fewer H2D bytes — the upload dwarfs the uint8
        # readback on constrained links; tools/profile_transport.py h2d_*).
        # Identical normalization arithmetic, byte-identical outputs
        # (tests/test_u8_upload.py). f32 keeps host-side normalization.
        up = str(inf.get("upload", "auto")).lower()
        if up == "auto":
            # strict fp32 bit-parity mode keeps host-side normalization:
            # TPU fp32 division is not guaranteed to round identically to
            # the host's IEEE divide, and precision=32's contract is
            # bit-parity with the torch oracle. bf16/32_fast absorb a
            # potential 1-ulp difference anyway (e2e bound is ±1 count).
            self.upload_u8 = self.precision not in (32, "32")
        elif up in ("u8", "uint8"):
            self.upload_u8 = True
        elif up in ("f32", "float32", "fp32"):
            self.upload_u8 = False
        else:
            raise ValueError(
                f"inference.upload={up!r}: expected auto/u8/f32")
        # inference.mask_upload: binary masks bit-pack for the wire
        # (np.packbits, 8x fewer bytes than the uint8 plane; exact in all
        # precision modes — see _mask_wire). "plane" restores the dense
        # (H, W, 1) upload.
        mu = str(inf.get("mask_upload", "packed")).lower()
        if mu in ("packed", "auto", "bits"):
            self.mask_packed = True
        elif mu == "plane":
            self.mask_packed = False
        else:
            raise ValueError(
                f"inference.mask_upload={mu!r}: expected packed/plane")
        # inference.temporal.flow_upload: the flow .npy is the LARGEST
        # per-frame H2D transfer in temporal mode (H*W*2 fp32 ≈ 4.1 MB at
        # 540x960 — more than the uint8 frame itself). f16 halves it; the
        # ~2^-10 relative coordinate quantization is far below the LK flow
        # estimator's own error, and warp math stays fp32 on device.
        # "auto" follows the upload gate: f16 whenever frames go uint8,
        # f32 under the strict precision=32 bit-parity contract.
        if self._temporal_flow_upload == "auto":
            self.temporal_flow_f16 = self.upload_u8
        elif self._temporal_flow_upload in ("f16", "float16", "half"):
            self.temporal_flow_f16 = True
        elif self._temporal_flow_upload in ("f32", "float32", "fp32"):
            self.temporal_flow_f16 = False
        else:
            raise ValueError(
                f"inference.temporal.flow_upload="
                f"{self._temporal_flow_upload!r}: expected auto/f16/f32")
        from patch_toon_tpu.utils.xla_options import resolve_xla_options

        # per-compile XLA option tuning (docs/perf/xla_ab.json); "auto"
        # applies the measured TPU winner, "none" the compiler defaults
        self.xla_options = resolve_xla_options(inf.get("xla_options", "auto"))
        self._mesh = None
        self._g_vars_sharded = None
        self.patch_size = int(cfg.data.patch_size)
        self.patch_positions: List[Box] = []
        self.logger = logging.getLogger("patch_toon_tpu.infer")
        # force-replaces root handlers: absl/plugin imports often install
        # their own first, which would silently swallow these INFO lines
        configure_logging(
            logging.DEBUG if self.debug_mode else logging.INFO)
        self.logger.setLevel(
            logging.DEBUG if self.debug_mode else logging.INFO)
        self._load_data_config()
        self._setup_model()
        self._frame_fns: Dict[Tuple[int, int, int, int], Any] = {}
        # Device-resident (packed boxes, Gaussian weights) keyed by the
        # exact tile-box layout: the weights table is bucket*ps*ps fp32
        # (13 MB at bucket 512) and tile boxes recur EXACTLY for static
        # masks — including the maskless streaming workload, where every
        # frame tiles identically — so re-uploading it per dispatch rode
        # the transport-capped wire for nothing (review r3). Small FIFO:
        # a shot holds one or a few distinct layouts.
        self._pack_cache: Dict[Any, Any] = {}
        self._pack_cache_cap = 8
        # created eagerly so the hot registration path never touches the
        # module-global init lock (_temporal_lock keeps a lazy fallback
        # only for bare instances built without __init__ in tests)
        self._temporal_members_lock = threading.RLock()
        self._temporal_members: set = set()

    # ------------------------------------------------------------------

    def _load_data_config(self) -> None:
        """Resolve guide channels from cfg.paths.additional_channels
        (reference generator.py:196-271, incl. band-count validation)."""
        from PIL import Image

        self.additional_channels: Dict[str, Dict[str, Any]] = {}
        paths_cfg = self.cfg.get("paths", {})
        for name, ccfg in (paths_cfg.get("additional_channels") or {}).items():
            if isinstance(ccfg, dict):
                path, depth = str(ccfg["path"]), int(ccfg.get("depth", 1))
            else:
                path, depth = str(ccfg), 1
            cdir = Path(path)
            if not cdir.exists():
                raise FileNotFoundError(f"Channel directory not found: {cdir}")
            samples = _image_files(cdir)
            if not samples:
                raise FileNotFoundError(f"No images found in {path}")
            actual = len(Image.open(samples[0]).getbands())
            if actual < depth:
                raise ValueError(
                    f"Channel {name} has insufficient channels: "
                    f"expected {depth}, but found {actual}")
            self.additional_channels[name] = {"path": path, "depth": depth}
        self.total_channels = 3 + sum(
            c["depth"] for c in self.additional_channels.values())
        if self.temporal_enabled:
            # temporal guide: flow-warped previous stylized frame appended as
            # the last input channels (no reference equivalent; see README)
            self.total_channels += self.temporal_depth

    def _setup_model(self) -> None:
        ckpt_path = str(self.cfg.paths.checkpoint)
        ckpt_channels = sniff_input_channels(ckpt_path)
        if ckpt_channels != self.total_channels:
            raise ValueError(
                f"Channel count mismatch! Checkpoint model expects "
                f"{ckpt_channels} channels, but current configuration has "
                f"{self.total_channels} channels.")  # generator.py:120-129

        from patch_toon_tpu.config import to_container

        gen_cfg = to_container(self.cfg.model.generator)
        gen_cfg.setdefault("args", {})
        # Orbax checkpoints are fully self-describing: the meta sidecar
        # carries the resolved generator args (filters, resnet_blocks, ...),
        # so non-default architectures stylize without manual model config.
        # (The reference can only sniff the channel width from a torch
        # state_dict, generator.py:115-129.)
        if Path(ckpt_path).is_dir():
            from patch_toon_tpu.train.checkpoints import CheckpointManager

            meta_args = CheckpointManager.read_meta(ckpt_path).get(
                "generator_args")
            if meta_args:
                gen_cfg["args"].update(meta_args)
        gen_cfg["args"]["input_channels"] = int(ckpt_channels)
        gen_cfg["args"]["additional_channels"] = None

        training_cfg = dict(to_container(self.cfg.training))
        training_cfg["precision"] = self.precision
        self.model = StyleTransferModel(
            generator_config=gen_cfg,
            discriminator_config=None,
            training_config=training_cfg,
            optimizer_config=to_container(self.cfg.optimizer),
            data_config=to_container(self.cfg.data),
            perception_loss_config=None,
        )
        if Path(ckpt_path).is_dir():
            from patch_toon_tpu.train.checkpoints import restore_generator

            g_params, g_batch_stats = restore_generator(ckpt_path)
        else:
            state = self.model.init_state(jax.random.PRNGKey(0),
                                          patch_size=self.patch_size)
            state = self.model.load_torch_checkpoint(state, ckpt_path)
            g_params, g_batch_stats = state.g_params, state.g_batch_stats
        self.g_vars = {"params": g_params, "batch_stats": g_batch_stats}
        # Optional Pallas fused InstanceNorm+activation path. Off by default:
        # the standalone kernel beats XLA's IN by ~25%, but inside the whole
        # generator it blocks XLA's cross-op fusion and loses end-to-end
        # (measured on v5e) — kept as an opt-in knob for future kernels.
        if bool(self.cfg.get("inference", {}).get("fused_norm", False)):
            self.model.generator = self.model.generator.clone(fused_norm=True)
        if self.quantize:
            # programs trace QuantConv (w8a8 on the int8 MXU); the 'quant'
            # activation scales join g_vars at first-frame calibration
            self.model.generator = self.model.generator.clone(
                quant_mode="int8")
        self.logger.info(
            f"Model ready: {ckpt_channels} input channels from {ckpt_path}")

    # ------------------------------------------------------------------

    def _frame_fn(self, h: int, w: int, c: int, bucket: int) -> Any:
        key = (h, w, c, bucket)
        if key not in self._frame_fns:
            self._frame_fns[key] = make_frame_fn(
                self.model.generator, self.patch_size, bucket, h, w, c,
                self.dtype, compiler_options=self.xla_options)
        return self._frame_fns[key]

    def _ensure_quant(self, frame) -> None:
        """First-frame w8a8 calibration (inference.quantize=int8).

        Runs ONE fp generator forward over the whole first frame with
        QuantConv in calib mode, folding each conv input's absmax into the
        'quant' collection; the scales then ride self.g_vars into every
        program unchanged (the builders pass g_vars through). Whole-frame
        calibration covers the tiled programs too: instance norm keeps
        every conv input in a stable normalized range, so tile-level
        absmax tracks frame-level absmax (validated by the int8-vs-fp
        PSNR test). Scales are static afterwards — no per-dispatch
        reduction ever rides the serving path."""
        if not self.quantize or "quant" in self.g_vars:
            return
        calib = self.model.generator.clone(quant_mode="calib")
        x = _to_signed_unit(jnp.asarray(frame))  # u8 uploads normalize here
        h, w = x.shape[0], x.shape[1]
        # the generator's two stride-2 stages + 2x upsamples need /4 dims;
        # trimming a couple of edge rows is harmless for absmax statistics
        x = x[None, :h // 4 * 4, :w // 4 * 4, :].astype(self.dtype)
        fn = jax.jit(lambda v, xx: calib.apply(
            v, xx, train=False, mutable=["quant"])[1])
        mut = fn({k: v for k, v in self.g_vars.items() if k != "quant"}, x)
        self.g_vars = dict(self.g_vars, quant=mut["quant"])
        self._g_vars_sharded = None  # pod replicas rebuild with the scales
        n = len(jax.tree_util.tree_leaves(mut["quant"]))
        self.logger.info(
            f"int8 serving: calibrated {n} activation scales on the "
            "first frame")

    def _packed_cached(self, key, build):
        """Device-resident packed (boxes, weights) for a tile layout.

        ``build`` returns host arrays; the uploaded jnp arrays are cached
        so repeated layouts (static masks, the maskless full-frame grid)
        skip the multi-MB weights H2D on every later dispatch."""
        hit = self._pack_cache.get(key)
        if hit is None:
            hit = tuple(jnp.asarray(a) for a in build())
            if len(self._pack_cache) >= self._pack_cache_cap:
                self._pack_cache.pop(next(iter(self._pack_cache)))
            self._pack_cache[key] = hit
        return hit

    def _stylize_device(
        self,
        frame: np.ndarray,                 # (H,W,C) fp32 [-1,1]
        mask: Optional[np.ndarray] = None,  # (H,W) eroded {0,1}, or None
        overlap_percent: Optional[float] = None,
        boxes: Optional[List[Box]] = None,  # precomputed tile boxes
    ):
        """Dispatch one frame's stylization; returns the device uint8 array
        (async — fetch with np.asarray) and the tile boxes."""
        self._ensure_quant(frame)
        h, w, c = frame.shape
        if mask is None:
            mask = np.ones((h, w), np.float32)
        if self.mode == "fullframe":
            key = ("fullframe", h, w, c)
            if key not in self._frame_fns:
                self._frame_fns[key] = make_fullframe_fn(
                    self.model.generator, h, w, c, self.dtype,
                    compiler_options=self.xla_options)
            u8, out_float = self._frame_fns[key](
                self.g_vars, jnp.asarray(frame),
                jnp.asarray(self._mask_wire(mask)))
            return u8, out_float, []
        if boxes is None:
            boxes = tile_boxes_from_mask(
                mask, self.patch_size,
                self.overlap_percent if overlap_percent is None
                else overlap_percent)
        bucket = bucket_size(max(1, len(boxes)))
        packed_boxes, weights = self._packed_cached(
            ("single", tuple(map(tuple, boxes)), bucket),
            lambda: pack_boxes(boxes, self.patch_size, bucket)[:2])
        fn = self._frame_fn(h, w, c, bucket)
        u8, out_float = fn(self.g_vars, jnp.asarray(frame),
                           packed_boxes, weights,
                           jnp.asarray(self._mask_wire(mask)))
        return u8, out_float, boxes

    def process_large_image(
        self,
        frame: np.ndarray,
        mask: Optional[np.ndarray] = None,
        overlap_percent: Optional[float] = None,
    ) -> np.ndarray:
        """Stylize one frame; returns (H,W,3) uint8."""
        u8, _, boxes = self._stylize_device(frame, mask, overlap_percent)
        self.patch_positions = boxes
        return np.asarray(u8)

    def _load_frame(self, input_path: str,
                    with_rgb_u8: bool = False,
                    channels: Optional[dict] = None) -> Any:
        from patch_toon_tpu.data.io import _decode_rgb_uint8

        if channels is None:
            channels = self.additional_channels
        rgb_u8 = _decode_rgb_uint8(input_path)
        # upload_u8: keep every channel in its decoded uint8 form — all
        # guide channels are 8-bit sources with the same /255*2-1
        # normalization (data/io.py load_image_channels), which the
        # inference programs now apply on-device (_to_signed_unit)
        parts = [rgb_u8 if self.upload_u8
                 else rgb_u8.astype(np.float32) / 255.0 * 2.0 - 1.0]
        for name, ccfg in channels.items():
            cpath = find_corresponding_image(ccfg["path"], input_path)
            if not os.path.exists(cpath):
                raise FileNotFoundError(
                    f"Required channel {name} not found: {cpath}")
            if self.upload_u8:
                parts.append(_decode_rgb_uint8(cpath)[..., :ccfg["depth"]])
            else:
                parts.append(load_image_channels(cpath, ccfg["depth"]))
        frame = np.concatenate(parts, axis=-1)
        return (frame, rgb_u8) if with_rgb_u8 else frame

    def _mask_up(self, mask: np.ndarray) -> np.ndarray:
        """Host-side mask representation for upload: uint8 {0,1} when
        upload_u8 (lossless — the engine's own mask path binarizes), else
        fp32. A FRACTIONAL mask (possible via the public
        process_large_image API) must not be floored by the uint8 cast —
        it stays fp32, preserving the partial composite."""
        if not self.upload_u8:
            return mask
        u8 = mask.astype(np.uint8)
        if (u8 == mask).all():
            return u8
        return mask

    def _mask_wire(self, mask: np.ndarray) -> np.ndarray:
        """Wire form of an (eroded) mask batch (..., H, W) for upload.

        Binary masks bit-pack via ``np.packbits`` (8x fewer wire bytes
        than the uint8 plane; on a congested tunnel the H2D leg gates the
        streaming headline, bench.py transport_h2d_MBps). The programs
        unpack on device (``_mask_f32`` with ``like=``) — the {0,1} plane
        is reproduced bit-for-bit, so packing is exact in EVERY precision
        mode, including strict fp32 parity. Fractional masks (possible via
        the public ``process_large_image`` API) ship as fp32 planes.
        ``inference.mask_upload=plane`` restores the unpacked form."""
        if self.mask_packed:
            u8 = mask.astype(np.uint8)
            if (u8 == mask).all():
                return np.packbits(u8.reshape(*u8.shape[:-2], -1), axis=-1)
        return self._mask_up(mask)[..., None]

    def _load_eroded_mask(self, mask_path: str, shape_hw) -> Optional[np.ndarray]:
        mask_dir = os.path.dirname(mask_path)
        resolved = find_corresponding_image(mask_dir,
                                            os.path.basename(mask_path))
        if not os.path.exists(resolved):
            if mask_dir.endswith("ignore"):
                return None  # full-frame stylization
            raise FileNotFoundError(f"Mask file not found: {resolved}")
        mask = load_mask(resolved)  # >128 binarize, [0,1]
        if tuple(mask.shape) != tuple(shape_hw):
            raise ValueError(
                f"Mask {resolved} is {mask.shape}, frame is "
                f"{tuple(shape_hw)} — mask/frame resolutions must match")
        # host erosion: load_mask output is binary, for which the numpy
        # windowed-sum erosion is bit-identical to the device conv — and
        # skips a ~2 MB fp32 upload + ~2 MB readback per frame through
        # slow transports (the eroded result is what actually ships, as
        # uint8, inside the dispatch)
        return erode_full_support_np(mask)

    def process_image(self, input_path: str, mask_path: str,
                      save_path: str) -> None:
        frame = self._load_frame(input_path)
        mask = self._load_eroded_mask(mask_path, frame.shape[:2])
        out = self.process_large_image(frame, mask)
        save_image_uint8(out, save_path)
        if self.debug_mode:
            self._save_debug_overlay(out, save_path)
        self.logger.info(f"Saved {save_path}")

    def _save_debug_overlay(self, out: np.ndarray, save_path: str) -> None:
        """Random-color tile rectangles (reference generator.py:301-325)."""
        from PIL import Image, ImageDraw

        img = Image.fromarray(out.copy())
        draw = ImageDraw.Draw(img)
        rng = np.random.default_rng(0)
        for y0, y1, x0, x1 in self.patch_positions:
            color = tuple(int(v) for v in rng.integers(100, 256, 3))
            draw.rectangle([x0, y0, x1, y1], outline=color, width=2)
        debug_path = str(Path(save_path).with_name(
            f"debug_{Path(save_path).name}"))
        img.save(debug_path)


    def _resolve_shard_files(self, files: List[Path],
                             explicit_files: bool) -> Optional[List[Path]]:
        """Multi-host frame partitioning for pod streaming.

        Per-frame stylization is stateless, so hosts need NO communication
        — each worker takes a round-robin slice of the frame list
        (inference.file_shard: "i/N", auto-derived per process when
        jax.distributed is up). Watch mode shards by name hash before
        calling (``explicit_files``). Returns this process's files, or
        None when it has no work (temporal multi-host: frames chain
        sequentially, so only process 0 stylizes)."""
        shard = self.cfg.get("inference", {}).get("file_shard")
        if explicit_files:
            shard = False  # watch mode shards by name hash before calling
        if shard is None and jax.process_count() > 1:
            if self.temporal_enabled:
                self.logger.warning(
                    "Multi-host run with the temporal guide: frames chain "
                    "sequentially, so only process 0 stylizes (shard whole "
                    "videos across hosts instead)")
                if jax.process_index() != 0:
                    return None
            else:
                # multi-host pod streaming: round-robin frame partition per
                # process (stateless per-frame work, no communication)
                shard = f"{jax.process_index()}/{jax.process_count()}"
        if shard:
            if self.temporal_enabled:
                raise ValueError(
                    "inference.file_shard is incompatible with the temporal "
                    "guide (frame i depends on frame i-1); shard videos, "
                    "not frames")
            idx, n = (int(x) for x in str(shard).split("/"))
            if not 0 <= idx < n:
                raise ValueError(f"file_shard {shard}: index out of range")
            files = files[idx::n]
            self.logger.info(f"File shard {idx}/{n}")
        return files

    def _load_for_dispatch(self, input_path: Path, mask_dir: Path,
                           crop_up: bool):
        """Decode + stage one frame for dispatch (prefetch-thread side):
        frame (device-resident on single-chip runs), eroded mask, the raw
        uint8 RGB (host-side paste source for cropped readbacks), the
        mask-support bbox, tile boxes, and the upload-crop window."""
        frame, rgb_u8 = self._load_frame(str(input_path), with_rgb_u8=True)
        mask = self._load_eroded_mask(
            str(mask_dir / input_path.name), frame.shape[:2])
        # Mask-support bbox for crop_readback — tile boxes can
        # under-cover the mask (stride-sampled speckle masks,
        # fullframe mode), so the bbox must come from the mask
        # itself. Computed here so the scans ride the prefetch
        # threads; maskless frames stylize everywhere (None).
        mbox = mask_support_bbox(mask) if mask is not None else None
        boxes = tile_boxes_from_mask(
            mask if mask is not None
            else np.ones(frame.shape[:2], np.float32),
            self.patch_size, self.overlap_percent)
        cropwin = None
        if crop_up and mask is not None:
            # the mask-support bbox rides along: stride-sampled tile
            # placement can skip speckle pixels, and those must land
            # inside the window for bit-parity (upload_crop_window)
            cropwin = upload_crop_window(boxes, *frame.shape[:2],
                                         self.patch_size,
                                         support_bbox=mbox)
        if cropwin is not None:
            # crop frame+mask to the window BEFORE upload and shift
            # the tile boxes into window coordinates — bit-identical
            # to the full-frame dispatch (see upload_crop_window);
            # rgb_u8 stays full for the host-side paste
            y0, y1, x0, x1 = cropwin
            frame = frame[y0:y1, x0:x1]
            mask = mask[y0:y1, x0:x1]
            boxes = [(b[0] - y0, b[1] - y0, b[2] - x0, b[3] - x0)
                     for b in boxes]
        if self.devices == 1:
            # upload from the prefetch thread: H2D overlaps the main
            # loop's compute + readback instead of serializing in
            # dispatch (the upload is the dominant wire cost on
            # constrained links — tools/ab_upload.py). Pod runs keep
            # host arrays: their upload targets a device_put sharding.
            frame = jax.device_put(frame)
        return frame, mask, rgb_u8, mbox, boxes, cropwin

    def process_directory(self, files: Optional[List[Path]] = None,
                          progress: bool = True) -> None:
        """Stylize every frame in paths.input_dir as a streaming pipeline.

        Same surface and per-file resilience as reference
        generator.py:674-705, but structured as overlapped stages: host
        decode runs ahead in a thread pool (native C++ PNG codec when
        available), device dispatches are pipelined at depth 2, and PNG
        encode/write happens in the native async writer — so the TPU never
        waits on IO.
        """
        from concurrent.futures import ThreadPoolExecutor

        from tqdm import tqdm

        from patch_toon_tpu.native import FrameWriter

        input_dir = Path(self.cfg.paths.input_dir)
        mask_dir = Path(self.cfg.paths.mask_dir)
        output_dir = Path(self.cfg.paths.output_dir)
        if not input_dir.exists():
            raise FileNotFoundError(f"Input directory not found: {input_dir}")
        if not mask_dir.name.endswith("ignore") and not mask_dir.exists():
            raise FileNotFoundError(f"Mask directory not found: {mask_dir}")
        output_dir.mkdir(parents=True, exist_ok=True)

        # Multi-stream temporal serving: a subdirectory-per-video layout
        # serves N independent warp chains on one chip, co-batching the
        # generator dispatch ACROSS streams (a single chain is sequential
        # and can't co-batch its own frames). Watch mode routes the same
        # layout through _watch_multistream before reaching here.
        if files is None and self.temporal_enabled:
            streams = self._detect_streams(input_dir)
            if streams:
                return self._process_multistream(
                    streams, input_dir, mask_dir, output_dir,
                    progress=progress)

        explicit_files = files is not None
        if files is None:
            files = _image_files(input_dir)

        files = self._resolve_shard_files(files, explicit_files)
        if files is None:
            return  # temporal multi-host: this process has no work
        self.logger.info(f"Found {len(files)} images to process")

        # crop_upload applies to masked tiled streaming only: fullframe
        # needs the whole frame (per-frame IN statistics), the temporal
        # chain warps full frames
        crop_up = (self.crop_upload and self.mode != "fullframe"
                   and not self.temporal_enabled)

        def load_one(input_path: Path):
            return self._load_for_dispatch(input_path, mask_dir, crop_up)

        writer = FrameWriter(num_threads=2)

        if self.temporal_enabled:
            try:
                self._process_directory_temporal(files, load_one, output_dir,
                                                 writer, mask_dir=mask_dir,
                                                 progress=progress)
            finally:
                # writer queue flushes even on Ctrl-C/SIGTERM mid-chain
                # (the chain's own finally already drained its readback)
                failed = writer.flush()
                writer.close()
                if failed:
                    self.logger.error(f"{failed} frame writes failed")
            return

        pipe = _GroupPipeline(self, writer, output_dir)

        group: List[Any] = []

        def flush_group():
            # hand off and CLEAR before dispatching: a failed dispatch
            # must drop its group, not poison every later one (per-file
            # resilience, generator.py:700)
            nonlocal group
            if not group:
                return
            g, group = group, []
            try:
                pipe.dispatch(g)
            except Exception as e:
                # a failed dispatch drops EVERY frame in the group —
                # name them all, not just the one that tripped it
                names = ", ".join(x[3].name for x in g)
                self.logger.error(
                    f"Dispatch failed; dropping group [{names}]: {e}")

        # frames-per-dispatch: co-batch frames so the pow2 tile bucket stays
        # full (tiling.frames_per_dispatch); 'auto' decides from frame 0
        fpd_cfg = self.cfg.get("inference", {}).get("frames_per_dispatch",
                                                    "auto")
        group_size = None if fpd_cfg == "auto" else max(1, int(fpd_cfg))
        if self.mode == "fullframe":
            group_size = 1  # fullframe is already one whole-frame pass
        if self.devices != 1:
            # pod streaming: frames shard over the mesh 'data' axis (no
            # cross-chip communication). Fullframe: one frame per chip.
            # Tiled: fpd frames per chip per dispatch, fpd decided from
            # frame 0 exactly like single-chip co-batching.
            self._ensure_mesh()
            if self.mode == "fullframe":
                group_size = self._mesh.devices.size
            else:
                group_size = None  # D * frames_per_dispatch, set below

        PREFETCH = 6  # bound decoded-frame memory to O(PREFETCH)
        try:
            with ThreadPoolExecutor(max_workers=2) as pool:
                futures = {}
                for p in files[:PREFETCH]:
                    futures[p] = pool.submit(load_one, p)
                for i, input_path in enumerate(
                        tqdm(files, desc="Processing images",
                             disable=not progress)):
                    if i + PREFETCH < len(files):
                        nxt = files[i + PREFETCH]
                        futures[nxt] = pool.submit(load_one, nxt)
                    try:
                        frame, mask, rgb_u8, mbox, boxes, cropwin = \
                            futures.pop(input_path).result()
                        eff_mask = mask if mask is not None else np.ones(
                            frame.shape[:2], np.float32)
                        if group_size is None:
                            group_size = self._decide_group_size(
                                len(boxes), fpd_cfg)
                        # a co-batched dispatch needs every frame in the
                        # group at ONE shape: upload-cropped windows bucket to
                        # 128-multiples so a stable mask reuses one shape, but
                        # when the window (or a maskless frame) changes shape,
                        # flush the in-progress group first. Crop-ness must
                        # also match: dispatch_group treats the whole group as
                        # cropped iff its FIRST member is, so an upload-cropped
                        # window and an uncropped full frame of coincidentally
                        # equal dims must never share a group (the paste would
                        # use the wrong coordinate space).
                        if group and (group[0][0].shape != frame.shape
                                      or (group[0][6] is None)
                                      != (cropwin is None)):
                            flush_group()
                        group.append((frame, eff_mask, boxes, input_path,
                                      rgb_u8, mbox, cropwin))
                    except Exception as e:
                        self.logger.error(
                            f"Failed to process {input_path.name}: {e}")
                        continue
                    if len(group) >= group_size:
                        flush_group()
                flush_group()
        finally:
            # graceful shutdown contract (watch mode / Ctrl-C / SIGTERM):
            # every dispatched frame's readback is drained and the writer
            # queue flushed even when an interrupt lands mid-stream — an
            # in-flight frame either reaches disk or is logged, never
            # silently dropped
            pipe.drain_all()
            pipe.close()
            failed = writer.flush()
            writer.close()
            if failed:
                self.logger.error(f"{failed} frame writes failed")

    def _decide_group_size(self, n_boxes: int, fpd_cfg) -> int:
        """Frames per dispatch group, decided from frame 0's tile count:
        co-batch frames so the tile bucket stays full
        (tiling.frames_per_dispatch); pod runs multiply by the mesh size
        (fpd frames per chip per dispatch)."""
        fpd = frames_per_dispatch(max(1, n_boxes),
                                  target=self.max_tile_batch)
        if fpd_cfg != "auto":
            fpd = max(1, int(fpd_cfg))
        if self.devices != 1:
            self._pod_fpd = fpd
            self.logger.info(
                f"Pod co-batching: {fpd} frames/chip x "
                f"{self._mesh.devices.size} chips/dispatch "
                f"(~{n_boxes} tiles/frame)")
            return self._mesh.devices.size * fpd
        self.logger.info(f"Co-batching {fpd} frames/dispatch "
                         f"(~{n_boxes} tiles/frame)")
        return fpd

    def _ensure_mesh(self) -> None:
        from patch_toon_tpu.parallel import make_mesh, replicate

        if self._mesh is None:
            # Multi-host runs build a LOCAL mesh: frames are partitioned
            # across hosts by file_shard (stateless per-frame work), so each
            # process drives only its own chips and no cross-host collective
            # program is ever compiled.
            local = (jax.local_devices() if jax.process_count() > 1
                     else None)
            self._mesh = make_mesh(
                data=self.devices if self.devices != 1 else -1,
                devices=local)
            self.logger.info(f"Pod inference mesh: {self._mesh}")
        if self._g_vars_sharded is None:
            # (re)replicate — _ensure_quant invalidates this when the
            # calibrated scales join g_vars
            self._g_vars_sharded = replicate(self.g_vars, self._mesh)

    def _stylize_group_pod(self, frames, masks, group_boxes):
        """Dispatch a frame group sharded over the mesh 'data' axis.

        Fullframe: one frame per chip. Tiled: consecutive chunks of
        ``self._pod_fpd`` frames per chip, each chip running the co-batched
        multiframe tile program on its chunk. Short final groups are padded
        by repeating the last frame; the caller only reads the real rows."""
        from patch_toon_tpu.infer.tiling import pack_boxes_multi
        from patch_toon_tpu.parallel import batch_sharding

        self._ensure_quant(frames[0])
        self._ensure_mesh()
        mesh = self._mesh
        sh = batch_sharding(mesh)
        D = mesh.devices.size
        n_real = len(frames)
        h, w, c = frames[0].shape

        if self.mode == "fullframe":
            frames = list(frames) + [frames[-1]] * (D - n_real)
            masks = list(masks) + [masks[-1]] * (D - n_real)
            key = ("pod_ff", D, h, w, c)
            if key not in self._frame_fns:
                self._frame_fns[key] = make_batched_fullframe_fn(
                    self.model.generator, h, w, c, self.dtype, mesh,
                    compiler_options=self.xla_options)
            with mesh:
                u8, _ = self._frame_fns[key](
                    self._g_vars_sharded,
                    jax.device_put(jnp.asarray(np.stack(frames)), sh),
                    jax.device_put(
                        jnp.asarray(self._mask_wire(np.stack(masks))), sh))
            return u8[:n_real]

        fpd = getattr(self, "_pod_fpd", 1)
        total = D * fpd
        frames = list(frames) + [frames[-1]] * (total - n_real)
        masks = list(masks) + [masks[-1]] * (total - n_real)
        group_boxes = list(group_boxes) + [group_boxes[-1]] * (total - n_real)
        chunks = [group_boxes[i * fpd:(i + 1) * fpd] for i in range(D)]
        bucket = bucket_size(
            max(1, max(sum(len(b) for b in ch) for ch in chunks)))

        def build_pod_pack():
            fb = np.zeros((D, bucket, 5), np.int32)
            wts = np.zeros((D, bucket, self.patch_size, self.patch_size),
                           np.float32)
            for i, ch in enumerate(chunks):
                fb[i], wts[i], _ = pack_boxes_multi(ch, self.patch_size,
                                                    bucket)
            return jax.device_put(fb, sh), jax.device_put(wts, sh)

        pkey = ("pod", tuple(tuple(tuple(b) for b in ch) for ch in chunks),
                bucket, D, fpd)
        hit = self._pack_cache.get(pkey)
        if hit is None:
            hit = build_pod_pack()
            if len(self._pack_cache) >= self._pack_cache_cap:
                self._pack_cache.pop(next(iter(self._pack_cache)))
            self._pack_cache[pkey] = hit
        fb_dev, wts_dev = hit
        key = ("podmf", D, fpd, h, w, c, bucket)
        if key not in self._frame_fns:
            self._frame_fns[key] = make_pod_multiframe_fn(
                self.model.generator, self.patch_size, bucket, fpd, h, w, c,
                self.dtype, mesh, compiler_options=self.xla_options)
        fr = np.stack(frames).reshape(D, fpd, h, w, c)
        mk = self._mask_wire(np.stack(masks).reshape(D, fpd, h, w))
        with mesh:
            u8, _ = self._frame_fns[key](
                self._g_vars_sharded,
                jax.device_put(jnp.asarray(fr), sh),
                fb_dev, wts_dev,
                jax.device_put(jnp.asarray(mk), sh))
        return u8.reshape(total, h, w, 3)[:n_real]

    def _stylize_group(self, frames, masks, group_boxes):
        """Dispatch a co-batched group through the multiframe tiled
        program; returns (u8 batch, composite float batch — the latter
        feeds multi-stream temporal chains)."""
        from patch_toon_tpu.infer.tiling import pack_boxes_multi

        self._ensure_quant(frames[0])
        f = len(frames)
        h, w, c = frames[0].shape
        total = sum(len(b) for b in group_boxes)
        bucket = bucket_size(max(1, total))
        fboxes, weights = self._packed_cached(
            ("group", tuple(tuple(map(tuple, b)) for b in group_boxes),
             bucket),
            lambda: pack_boxes_multi(group_boxes, self.patch_size,
                                     bucket)[:2])
        key = ("multi", f, h, w, c, bucket)
        if key not in self._frame_fns:
            self._frame_fns[key] = make_multiframe_fn(
                self.model.generator, self.patch_size, bucket, f, h, w, c,
                self.dtype, compiler_options=self.xla_options)
        # jnp.stack, not np.stack: frames may be device-resident already
        # (prefetch-thread upload) — np.stack would force a D2H round trip
        u8, out_float = self._frame_fns[key](
            self.g_vars, jnp.stack(frames),
            fboxes, weights,
            jnp.asarray(self._mask_wire(np.stack(masks))))
        return u8, out_float


class _GroupPipeline:
    """Dispatch → per-frame sliced fetch → bounded drain for grouped
    streaming — the device/wire half of ``process_directory`` (extracted
    r5, VERDICT r4 #6). Owns the in-flight readback window and the fetch
    pool; the engine owns dispatch itself (`_stylize_*`).

    Group tuples are ``(frame, eff_mask, boxes, input_path, rgb_u8, mbox,
    cropwin)`` as staged by ``_load_for_dispatch``."""

    def __init__(self, engine, writer, output_dir: Path):
        from concurrent.futures import ThreadPoolExecutor

        self.e = engine
        self.writer = writer
        self.output_dir = output_dir
        # fetch pool: each in-flight group's D2H readback runs in its own
        # thread so transfers overlap on the wire — the tunnel multiplexes
        # (4 concurrent fetches measured 1.8x one serial fetch's bandwidth,
        # tools/profile_transport.py); a serial drain leaves that unused
        self.fetch_pool = ThreadPoolExecutor(
            max_workers=engine.readback_streams)
        # (per-frame fetch Futures, per-frame tile boxes, save paths, crop)
        self.in_flight: List[Tuple[List[Any], List[List[Box]], List[Path],
                                   Any]] = []

    def drain_one(self) -> None:
        e = self.e
        futs, group_boxes, save_paths, crop = self.in_flight.pop(0)
        failed = []  # (name, error) — the transfers are independent,
        # so one frame's failure must not drop its siblings' data
        for k, save_path in enumerate(save_paths):
            try:
                img = futs[k].result()  # (H, W, 3) or cropped (bh,bw,3)
            except Exception as err:
                failed.append((save_path.name, err))
                continue
            if crop is not None:
                bboxes, rgb_u8s = crop  # per-frame paste windows
                y0, y1, x0, x1 = bboxes[k]
                full = rgb_u8s[k].copy()
                full[y0:y1, x0:x1] = img
                img = full
            self.writer.submit(str(save_path), img)
            if e.debug_mode:
                e.patch_positions = group_boxes[k]
                e._save_debug_overlay(img, str(save_path))
        if failed:
            # log EVERY (name, error) pair with its traceback first:
            # chaining only failed[0] would hide a distinct root cause
            # when a flaky tunnel fails several fetches differently
            for n, err in failed:
                e.logger.error(f"readback failed for {n}", exc_info=err)
            names = ", ".join(f"{n}: {err!r}" for n, err in failed)
            raise RuntimeError(
                f"readback failed for [{names}]") from failed[0][1]

    def dispatch(self, group) -> None:
        e = self.e
        frames = [g[0] for g in group]
        masks = [g[1] for g in group]
        group_boxes = [g[2] for g in group]
        paths = [self.output_dir / g[3].name for g in group]
        if e.devices != 1:
            out = e._stylize_group_pod(frames, masks, group_boxes)
        elif len(group) == 1:
            u8, _, _ = e._stylize_device(frames[0], masks[0],
                                         boxes=group_boxes[0])
            out = u8[None]
        else:
            out, _ = e._stylize_group(frames, masks, group_boxes)
        cropwins = [g[6] for g in group]
        if cropwins[0] is not None:
            # upload-cropped group: the program already ran on the
            # window, so the whole (small) output ships and pastes at
            # each frame's own window origin. Debug overlays need the
            # tile boxes back in full-frame coordinates.
            crop = (cropwins, [g[4] for g in group])
            e._last_crop = cropwins[0]  # introspection/tests
            group_boxes = [
                [(b[0] + cw[0], b[1] + cw[0], b[2] + cw[2], b[3] + cw[2])
                 for b in bx]
                for bx, cw in zip(group_boxes, cropwins)]
        else:
            crop = None
            bbox = compute_crop_bbox([g[5] for g in group],
                                     *frames[0].shape[:2]) \
                if e.crop_readback else None
            e._last_crop = bbox  # introspection/tests
            if bbox is not None:
                y0, y1, x0, x1 = bbox
                out = out[:, y0:y1, x0:x1]
                crop = ([bbox] * len(group), [g[4] for g in group])
        # fetch PER FRAME, not per group: slicing the (F, h, w, 3)
        # output into F device arrays multiplies concurrent wire
        # streams (the tunnel multiplexes ~2x at 6 streams) and
        # restores 1-frame granularity at fpd>1 — measured 3.7x
        # streaming vs the whole-group fetch on a contended tunnel
        # (tools/profile_sliced_fetch.py, docs/perf/sliced_fetch_r3)
        slices = [out[k] for k in range(out.shape[0])]
        for s in slices:
            try:
                s.copy_to_host_async()
            except Exception:
                pass
        self.in_flight.append(([self.fetch_pool.submit(np.asarray, s)
                                for s in slices],
                               group_boxes, paths, crop))
        # window counted in FRAMES (the fetch unit), deep enough to
        # keep readback_streams transfers truly concurrent while the
        # device runs ahead — the measured configuration
        # (tools/profile_sliced_fetch.py, bench._submit_frames)
        while sum(len(g[0]) for g in self.in_flight) > \
                e.readback_streams + 2 and len(self.in_flight) > 1:
            try:
                self.drain_one()
            except Exception as err:
                # a deferred device error belongs to the DRAINED group
                # (already popped), not the group just dispatched
                e.logger.error(f"Readback failed: {err}")

    def drain_all(self) -> None:
        while self.in_flight:
            # deferred device errors surface at the tail fetch; drop
            # only the group whose fetch failed and keep draining the
            # rest (they are independent dispatches)
            try:
                self.drain_one()
            except Exception as err:
                self.e.logger.error(f"Tail drain failed for a group: {err}")

    def close(self) -> None:
        self.fetch_pool.shutdown(wait=False)










