"""Point advection through saved flow fields (device-side, batched).

Replaces the reference's per-point numba loops
(tools/gaussian_filter.py:100-120 ``_sample_bilinear_numba`` and the Python
advection loops at :349-401) with one vmapped gather: all tracked points are
advected through a flow field in a single jitted call, with the same
clamped-neighbour bilinear sampling and in-bounds validity semantics
(points that leave the frame are invalidated and stay invalid).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_flow_bilinear(flow: jax.Array, points: jax.Array) -> jax.Array:
    """Bilinear flow sample at (x, y) points with clamped neighbours.

    flow: (H, W, 2); points: (N, 2) as (x, y). Matches
    tools/gaussian_filter.py:100-120 exactly (floor + per-corner clamping).
    """
    h, w = flow.shape[:2]
    x = points[:, 0]
    y = points[:, 1]
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    s = (x - ix)[:, None]
    t = (y - iy)[:, None]
    ix0 = jnp.clip(ix, 0, w - 1)
    ix1 = jnp.clip(ix + 1, 0, w - 1)
    iy0 = jnp.clip(iy, 0, h - 1)
    iy1 = jnp.clip(iy + 1, 0, h - 1)
    return ((1 - s) * (1 - t) * flow[iy0, ix0]
            + s * (1 - t) * flow[iy0, ix1]
            + (1 - s) * t * flow[iy1, ix0]
            + s * t * flow[iy1, ix1])


@jax.jit
def advect_points(
    flow: jax.Array,     # (H, W, 2) (dx, dy)
    points: jax.Array,   # (N, 2) (x, y)
    valid: jax.Array,    # (N,) bool
) -> Tuple[jax.Array, jax.Array]:
    """One advection step: p' = p + flow(p); invalidate out-of-bounds points.

    Mirrors reference gaussian_filter.py:360-374: the pre-step bounds check,
    the displacement add, and the post-step bounds check (dropped points are
    here masked invalid instead of removed, preserving order and count).
    """
    h, w = flow.shape[:2]
    in_pre = ((points[:, 0] >= 0) & (points[:, 0] < w)
              & (points[:, 1] >= 0) & (points[:, 1] < h))
    new_points = points + sample_flow_bilinear(flow, points)
    in_post = ((new_points[:, 0] >= 0) & (new_points[:, 0] < w)
               & (new_points[:, 1] >= 0) & (new_points[:, 1] < h))
    new_valid = valid & in_pre & in_post
    # keep invalid points frozen at their last position (never rendered)
    out = jnp.where(new_valid[:, None], new_points, points)
    return out, new_valid
