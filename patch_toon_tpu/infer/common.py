"""Shared inference helpers: normalization, mask wire forms, crop windows.

Split out of ``infer.engine`` (r4, VERDICT r3 #3) so the serving-mode
modules (engine / temporal / multistream / watch) and ``bench.py`` all
derive these semantics from ONE definition. Reference anchors live on each
function's docstring; ``engine`` re-exports every public name for
back-compat.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.data.io import list_images

def _to_signed_unit(frame):
    """uint8 [0,255] -> fp32 [-1,1] via the exact reference normalization
    arithmetic (reference dataset.py:191 ToTensor+Normalize: /255*2-1);
    float frames pass through untouched.

    Every inference program accepts either representation: uint8 upload
    moves normalization on-device, cutting H2D bytes 4x — the upload is
    the dominant wire cost through a constrained link (fp32 c6 frame =
    ~11 MB vs the 1.4 MB uint8 readback; tools/profile_transport.py
    h2d_* rows). The dtype is static at trace time, so the fp32 path
    compiles to the identical program as before."""
    if frame.dtype == jnp.uint8:
        return frame.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return frame

def _mask_f32(mask, like=None):
    """Masks upload as fp32 planes, uint8 {0,1} planes (4x fewer bytes),
    or bit-PACKED uint8 (``np.packbits`` of the binary plane — 8x fewer
    wire bytes again, ~65 KB vs 519 KB at 540x960; the mask is the
    second-largest upload after the frame). Compute is always fp32.

    A packed mask is recognized by rank: ``like`` (the frame batch the
    mask belongs to) has 2 more axes — (..., H, W, C) vs (..., ceil(H*W/8))
    — and H, W are static inside the jitted program, so the unpack is one
    fused device op (``_mask_wire`` is the host-side encoder)."""
    if like is not None and mask.ndim == like.ndim - 2:
        h, w = like.shape[-3], like.shape[-2]
        bits = jnp.unpackbits(mask, axis=-1, count=h * w)
        return bits.reshape(*mask.shape[:-1], h, w, 1).astype(jnp.float32)
    return mask if mask.dtype == jnp.float32 else mask.astype(jnp.float32)

def _image_files(directory: Path) -> List[Path]:
    """Sorted image Paths in a directory — the SAME extension set the data
    layer accepts (data/io.list_images: .png/.jpg/.jpeg, any case). A bare
    ``glob('*.[pj][np][g]')`` silently missed ``.jpeg`` and uppercase
    extensions, so inference no-opped on inputs training handled fine.

    A missing/removed directory returns [] (glob's old semantics): the
    watch loops call this every poll, and deleting a stream subdirectory
    mid-watch must make that stream go quiet, not crash the service."""
    try:
        return [Path(directory) / f for f in list_images(directory)]
    except (FileNotFoundError, NotADirectoryError):
        return []

def _composite_u8(rgb, out, mask):
    """Masked composite + clip + uint8 tail shared by EVERY inference
    program (reference generator.py:562-563 + 643-652 semantics). Any
    change to the output convention must happen here, once — a missed
    site would silently break bit-parity between modes."""
    out = rgb * (1.0 - mask) + out * mask
    out = jnp.clip(out, -1.0, 1.0)
    u8 = jnp.round(
        jnp.clip((out + 1.0) * 127.5, 0.0, 255.0)).astype(jnp.uint8)
    return u8, out

def _gather_repr(x: jax.Array, dtype) -> Tuple[jax.Array, int]:
    """Re-express an array for the fast batched-slice path.

    The v5e fp32 batched dynamic_slice is pathological (~28-50 ms/frame vs
    ~0.4 ms for 16-bit elements — measured ~80x). bf16 compute casts before
    gathering (value-identical); fp32-parity compute bitcasts each fp32
    lane into two uint16 lanes, gathers, and bitcasts back — bit-exact.
    Returns (reexpressed array, lane multiplier)."""
    if jnp.dtype(dtype) != jnp.float32:
        return x.astype(dtype), 1
    u16 = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint16)
    return u16.reshape(*x.shape[:-1], x.shape[-1] * 2), 2

def _from_gather_repr(tile: jax.Array, c: int, mult: int) -> jax.Array:
    if mult == 1:
        return tile
    return jax.lax.bitcast_convert_type(
        tile.reshape(*tile.shape[:-1], c, 2), jnp.float32)

def _parse_crop_knob(value, knob: str = "crop_readback") -> bool:
    """Strict allow-list (like resolve_xla_options): a typo like 'of' or
    'disable' must raise, not silently enable cropping."""
    v = str(value).lower()
    if v in ("auto", "on", "true", "1", "yes"):
        return True
    if v in ("off", "false", "0", "no", "none", "disabled"):
        return False
    raise ValueError(
        f"inference.{knob}={value!r}: expected one of "
        "auto/on/true/1/yes or off/false/0/no/none/disabled")

def mask_support_bbox(mask: np.ndarray):
    """(y0, y1, x0, x1) bounds of a mask's nonzero support; (0,0,0,0) for
    an empty mask. The composite is out = rgb*(1-m) + styl*m, so every
    pixel that can differ from the input lies inside this box. Shared by
    the engine's prefetch path and bench.py's masked workload."""
    rows = np.flatnonzero(mask.any(axis=1))
    if not len(rows):
        return (0, 0, 0, 0)
    cols = np.flatnonzero(mask.any(axis=0))
    return (int(rows[0]), int(rows[-1]) + 1,
            int(cols[0]), int(cols[-1]) + 1)

def compute_crop_bbox(mask_boxes, h: int, w: int,
                      align: int = 64, full_frac: float = 0.85):
    """Readback bbox for a group of frames: the union of their mask-support
    bboxes, padded to ``align``-multiples (bounds the number of distinct
    slice shapes, so mask drift doesn't recompile). The mask support — not
    the tile union — is what bounds every pixel the composite can change.
    Returns None when any frame is maskless (stylized everywhere) or the
    union covers >= ``full_frac`` of the frame (cropping saves nothing).

    Module-level (not an engine method) so bench.py derives its masked-
    workload bbox from the SAME logic the engine ships."""
    if any(mb is None for mb in mask_boxes):
        return None  # maskless frames stylize everywhere
    live = [mb for mb in mask_boxes if mb[1] > mb[0]]
    if not live:
        live = [(0, 1, 0, 1)]  # all masks empty: fetch 1 row
    y0 = min(mb[0] for mb in live)
    y1 = max(mb[1] for mb in live)
    x0 = min(mb[2] for mb in live)
    x1 = max(mb[3] for mb in live)
    y0, x0 = (y0 // align) * align, (x0 // align) * align
    y1 = min(h, -(-y1 // align) * align)
    x1 = min(w, -(-x1 // align) * align)
    if (y1 - y0) * (x1 - x0) >= full_frac * h * w:
        return None  # near-full frame: cropping saves nothing
    return y0, y1, x0, x1

def upload_crop_window(boxes, h: int, w: int, ps: int,
                       bucket: int = 128, full_frac: float = 0.9,
                       support_bbox=None):
    """Crop window for UPLOADING a masked tiled frame (crop_upload).

    The tiled program only ever reads the frame inside the tile gather
    footprint — make_frame_fn's gather reads EXACTLY the ps x ps window
    centered on each (possibly short) box: rows [y0-hoff, y0-hoff+ps)
    with hoff = (ps-(y1-y0))//2, same for columns. The window is the
    union of that read footprint AND the mask-support bbox
    (``support_bbox``): tile placement stride-samples the nonzero list,
    so isolated speckle mask pixels can fall outside every tile — under
    the full-frame dispatch they composite to the zero canvas (uint8
    gray), and the host-side paste outside the window would instead keep
    the input bytes. With the support inside the window, every pixel the
    composite can touch is computed by the SAME program arithmetic, so
    cropping frame+mask to the window BEFORE upload, running the program
    on the small domain (tile boxes shifted by the crop origin), and
    pasting the output back into the input bytes host-side is
    BIT-IDENTICAL to the full-frame dispatch: reads beyond the window
    are zero-pad in both domains (outside the frame) or never happen,
    and outside the window the mask is zero (composite == input bytes).

    Window dims bucket up to ``bucket``-multiples (clipped to the frame)
    so mask drift across a shot reuses one compiled program; the origin
    slides to keep the window inside the frame. Returns None when the
    bucketed window covers >= ``full_frac`` of the frame (no saving) or
    there are no tiles."""
    if not boxes:
        return None
    rd = []
    for y0b, y1b, x0b, x1b in boxes:
        hoff = (ps - (y1b - y0b)) // 2
        woff = (ps - (x1b - x0b)) // 2
        rd.append((y0b - hoff, y0b - hoff + ps,
                   x0b - woff, x0b - woff + ps))
    if support_bbox is not None and support_bbox[1] > support_bbox[0]:
        sy0, sy1, sx0, sx1 = support_bbox
        rd.append((sy0, sy1, sx0, sx1))
    uy0 = max(0, min(r[0] for r in rd))
    uy1 = min(h, max(r[1] for r in rd))
    ux0 = max(0, min(r[2] for r in rd))
    ux1 = min(w, max(r[3] for r in rd))
    bh = min(h, -(-(uy1 - uy0) // bucket) * bucket)
    bw = min(w, -(-(ux1 - ux0) // bucket) * bucket)
    if bh * bw >= full_frac * h * w:
        return None
    y0 = max(0, min(uy0, h - bh))
    x0 = max(0, min(ux0, w - bw))
    return y0, y0 + bh, x0, x0 + bw
