"""Anti-aliased Gaussian point splatting (device-side).

Replaces the reference's numba ``_draw_points_numba``
(tools/gaussian_filter.py:122-141): each point alpha-composites a Gaussian
blob of its color over the canvas, ``out = out*(1-wt) + color*wt`` with
``wt = exp(-((xi-x)^2 + (yi-y)^2) / sigma^2)`` over a window of radius
``r = int(3*sigma)``.

The reference runs this with ``prange`` (racy-by-design when blobs overlap —
SURVEY.md §5); this implementation is a deterministic sequential
lax.scan in ascending point order over a padded canvas, which is the
race-free semantics of the same loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("sigma",))
def splat_points(
    image: jax.Array,     # (H, W, 3) float32 in [0, 1]
    points: jax.Array,    # (N, 2) (x, y) float32
    colors: jax.Array,    # (N, 3) float32 in [0, 1]
    valid: jax.Array,     # (N,) bool
    sigma: float,
) -> jax.Array:
    h, w, _ = image.shape
    r = int(3 * sigma)
    win = 2 * r + 2
    pad = r + 1
    canvas = jnp.pad(image, ((pad, pad), (pad, pad), (0, 0)))

    offs = jnp.arange(win, dtype=jnp.float32)

    def body(cv, inp):
        p, color, v = inp
        x, y = p[0], p[1]
        # reference window bounds use C-style truncation: int(y-r)..int(y+r)
        y_lo = (y - r).astype(jnp.int32)
        y_hi = (y + r).astype(jnp.int32)
        x_lo = (x - r).astype(jnp.int32)
        x_hi = (x + r).astype(jnp.int32)
        start_y = jnp.floor(y).astype(jnp.int32) - r + pad
        start_x = jnp.floor(x).astype(jnp.int32) - r + pad
        yi = (start_y - pad).astype(jnp.float32) + offs   # absolute rows
        xi = (start_x - pad).astype(jnp.float32) + offs   # absolute cols
        wt = jnp.exp(-(jnp.square(xi[None, :] - x) + jnp.square(yi[:, None] - y))
                     / (sigma * sigma))
        in_ref_window = (
            (yi[:, None] >= y_lo) & (yi[:, None] <= y_hi)
            & (xi[None, :] >= x_lo) & (xi[None, :] <= x_hi)
        )
        wt = jnp.where(in_ref_window, wt, 0.0) * v.astype(jnp.float32)
        patch = jax.lax.dynamic_slice(cv, (start_y, start_x, 0), (win, win, 3))
        patch = patch * (1.0 - wt[..., None]) + color * wt[..., None]
        cv = jax.lax.dynamic_update_slice(cv, patch, (start_y, start_x, 0))
        return cv, None

    canvas, _ = jax.lax.scan(body, canvas, (points, colors, valid))
    return canvas[pad:pad + h, pad:pad + w]
