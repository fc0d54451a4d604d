"""Pallas TPU kernel: Gaussian-weighted tile compositor.

The tiled inference engine blends generator output tiles into the frame
canvas with per-tile Gaussian windows. The XLA formulation is a sequential
``lax.scan`` of dynamic-slice read-modify-writes (~90us/tile on v5e — the
canvas round-trips HBM every iteration). This kernel inverts the loop: the
grid runs over CANVAS BLOCKS in parallel; each program accumulates only the
tiles binned to its block (host-side CSR binning, arrays delivered via
scalar prefetch) in VMEM, and writes its block once.

Mosaic-friendly mechanics: tiles are channels-first with the minor dim
zero-padded to 128 (HBM DMA slices need 128-multiple minor dims); in-block
placement rolls lanes into position and splits the sublane offset into an
8-aligned base plus an in-strip roll (sublane indices must be provably %8).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BY = 256
BX = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def bin_tiles(
    positions: np.ndarray,  # (B, 2) int32 (flat_y0, x0); <0 for padding
    canvas_h: int,
    canvas_w: int,
    ps: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR binning of tiles to canvas blocks -> (offsets, tile_ids).

    offsets has nblocks+1 entries; tile_ids is padded to 4*B (a ps<=BY,BX
    tile intersects at most 4 blocks). Runs on host numpy (microseconds).
    """
    nby = _round_up(canvas_h, BY) // BY
    nbx = _round_up(canvas_w, BX) // BX
    nblocks = nby * nbx
    per_block = [[] for _ in range(nblocks)]
    for t, (y0, x0) in enumerate(np.asarray(positions)):
        if y0 < 0:
            continue  # padding tile
        for bi in range(max(0, y0 // BY), min(nby - 1, (y0 + ps - 1) // BY) + 1):
            for bj in range(max(0, x0 // BX),
                            min(nbx - 1, (x0 + ps - 1) // BX) + 1):
                per_block[bi * nbx + bj].append(t)
    offsets = np.zeros(nblocks + 1, np.int32)
    ids = np.zeros(max(1, 4 * len(positions)), np.int32)
    k = 0
    for b in range(nblocks):
        offsets[b] = k
        for t in per_block[b]:
            ids[k] = t
            k += 1
    offsets[nblocks] = k
    return offsets, ids


def _kernel(offs_ref, ids_ref, boxes_ref, gen_ref, wts_ref,
            canvas_ref, wcanvas_ref, acc, wacc, tile_s, wt_s, sems,
            *, ps: int, byp: int, bxp: int, nbx: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    blk_y0 = i * BY
    blk_x0 = j * BX
    b = i * nbx + j

    acc[...] = jnp.zeros_like(acc)
    wacc[...] = jnp.zeros_like(wacc)

    def body(k, carry):
        t = ids_ref[k]
        y0 = boxes_ref[t, 0]
        x0 = boxes_ref[t, 1]
        cp_t = pltpu.make_async_copy(gen_ref.at[t], tile_s, sems.at[0])
        cp_w = pltpu.make_async_copy(wts_ref.at[t], wt_s, sems.at[1])
        cp_t.start()
        cp_w.start()
        cp_t.wait()
        cp_w.wait()
        dy = y0 - blk_y0 + ps   # halo offset: always in [0, BY+ps]
        dx = x0 - blk_x0 + ps
        # (ps+8)-row strips: lanes rolled into place, sublane remainder
        # (dy % 8) rolled within the strip, then added at the 8-aligned
        # base offset (Mosaic requires sublane indices provably %8)
        dy8 = pl.multiple_of((dy // 8) * 8, 8)
        rem = dy - dy8
        tile = jnp.pad(tile_s[...], ((0, 0), (0, 8), (0, bxp - 128)))
        wt = jnp.pad(wt_s[...], ((0, 8), (0, bxp - 128)))
        tile = pltpu.roll(pltpu.roll(tile, rem, 1), dx, 2)
        wt = pltpu.roll(pltpu.roll(wt, rem, 0), dx, 1)
        cur = acc[:, pl.ds(dy8, ps + 8), :]
        acc[:, pl.ds(dy8, ps + 8), :] = cur + tile * wt[None]
        curw = wacc[:, pl.ds(dy8, ps + 8), :]
        wacc[:, pl.ds(dy8, ps + 8), :] = curw + wt[None]
        return carry

    jax.lax.fori_loop(offs_ref[b], offs_ref[b + 1], body, 0)
    canvas_ref[...] = acc[:, ps:ps + BY, ps:ps + BX]
    wcanvas_ref[...] = wacc[:1, ps:ps + BY, ps:ps + BX]


@functools.partial(
    jax.jit, static_argnames=("canvas_h", "canvas_w", "interpret"))
def blend_tiles(
    gen: jax.Array,        # (B, ps, ps, 3) fp32 generator tile outputs
    weights: jax.Array,    # (B, ps, ps) fp32 Gaussian windows (0 = padding)
    positions: jax.Array,  # (B, 2) int32 (flat_y0, x0); -10000 for padding
    offsets: jax.Array,    # (nblocks+1,) int32 CSR offsets (bin_tiles)
    tile_ids: jax.Array,   # (4B,) int32 CSR tile indices (bin_tiles)
    canvas_h: int,
    canvas_w: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """-> (canvas (H, W, 3), wcanvas (H, W, 1)) weighted accumulations."""
    n_tiles, ps = gen.shape[0], gen.shape[1]
    hp = _round_up(canvas_h, BY)
    wp = _round_up(canvas_w, BX)
    nby, nbx = hp // BY, wp // BX
    byp = BY + 2 * ps + 8  # +8: sublane-alignment headroom for placement
    bxp = _round_up(BX + 2 * ps, 128)

    # channels-first, last dim zero-padded to 128: HBM->VMEM DMA slices
    # require 128-multiple minor dims
    gen_cf = jnp.pad(jnp.transpose(gen, (0, 3, 1, 2)),
                     ((0, 0), (0, 0), (0, 0), (0, 128 - ps)))
    weights = jnp.pad(weights, ((0, 0), (0, 0), (0, 128 - ps)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nby, nbx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # tiles stay in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),   # weights stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((3, BY, BX), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((1, BY, BX), lambda i, j, *_: (0, i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, byp, bxp), jnp.float32),
            pltpu.VMEM((1, byp, bxp), jnp.float32),
            pltpu.VMEM((3, ps, 128), jnp.float32),
            pltpu.VMEM((ps, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    canvas, wcanvas = pl.pallas_call(
        functools.partial(_kernel, ps=ps, byp=byp, bxp=bxp, nbx=nbx),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(offsets, tile_ids, positions, gen_cf, weights)
    canvas = jnp.transpose(canvas, (1, 2, 0))[:canvas_h, :canvas_w]
    wcanvas = jnp.transpose(wcanvas, (1, 2, 0))[:canvas_h, :canvas_w]
    return canvas, wcanvas
