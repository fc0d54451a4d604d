"""Tile-compositor Pallas kernel tests (interpret mode).

NOTE: this kernel is an engineering experiment, NOT wired into the engine —
measured on v5e, per-tile dynamic placement costs ~95us/tile in any
formulation (Pallas grids are sequential on a single core, so canvas-block
parallelism does not exist), and the XLA lax.scan formulation stays faster
in context. Kept for correctness-tested reuse when multi-core Pallas or
cheaper dynamic lane placement lands.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patch_toon_tpu.ops.pallas_blend import bin_tiles, blend_tiles


def _ref(gen, wts, pos, H, W):
    ref = np.zeros((H, W, 3), np.float32)
    refw = np.zeros((H, W, 1), np.float32)
    for t in range(len(pos)):
        y, x = pos[t]
        if y < 0:
            continue
        ref[y:y+gen.shape[1], x:x+gen.shape[2]] += gen[t] * wts[t][..., None]
        refw[y:y+gen.shape[1], x:x+gen.shape[2]] += wts[t][..., None]
    return ref, refw


@pytest.mark.parametrize("seed", [0, 1])
def test_blend_tiles_matches_reference(seed):
    rng = np.random.default_rng(seed)
    B, ps, H, W = 14, 16, 70, 90
    gen = rng.random((B, ps, ps, 3)).astype(np.float32)
    wts = rng.random((B, ps, ps)).astype(np.float32)
    pos = np.stack([rng.integers(0, H - ps, B),
                    rng.integers(0, W - ps, B)], 1).astype(np.int32)
    wts[-2:] = 0
    pos[-2:] = -10000  # padding tiles
    offs, ids = bin_tiles(pos, H, W, ps)
    canvas, wcanvas = blend_tiles(
        jnp.asarray(gen), jnp.asarray(wts), jnp.asarray(pos),
        jnp.asarray(offs), jnp.asarray(ids), H, W, interpret=True)
    ref, refw = _ref(gen, wts, pos, H, W)
    np.testing.assert_allclose(np.asarray(canvas), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wcanvas), refw, atol=1e-5)


def test_bin_tiles_covers_all_intersections():
    pos = np.array([[0, 0], [250, 250], [100, 500], [-10000, -10000]],
                   np.int32)
    offs, ids = bin_tiles(pos, 512, 768, 80)
    # tile 1 at (250,250) spans blocks (0,0),(0,1),(1,0),(1,1)
    entries = [(b, ids[k]) for b in range(len(offs) - 1)
               for k in range(offs[b], offs[b + 1])]
    tiles_of = {}
    for b, t in entries:
        tiles_of.setdefault(int(t), []).append(b)
    assert len(tiles_of[1]) == 4
    assert 3 not in tiles_of  # padding tile binned nowhere
