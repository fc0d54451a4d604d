"""Mask morphology on device.

The reference uses a 7x7 ones-conv for two different purposes, and the
asymmetry is load-bearing (see SURVEY.md §7 "reference quirk decisions"):

- training (dataset.py:161-174): nonzero of the conv output — a *dilation* —
  defines the valid patch-center set;
- inference (generator.py:327-351): conv output below full support (49) is
  zeroed — a true *erosion* — keeping only pixels whose whole 7x7
  neighbourhood is masked.

Both are implemented here as one XLA conv over NHWC with explicit SAME-style
padding (k//2), computed in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_count_map(mask: jax.Array, kernel_size: int = 7) -> jax.Array:
    """Sum of a binary mask over each kxk window (zero-padded), shape HW.

    Equivalent to conv2d with a ones (k,k) kernel, stride 1, padding k//2
    (reference dataset.py:161-168 / generator.py:335-342).
    """
    m = mask.astype(jnp.float32)[None, :, :, None]  # NHWC
    kernel = jnp.ones((kernel_size, kernel_size, 1, 1), jnp.float32)
    pad = kernel_size // 2
    out = jax.lax.conv_general_dilated(
        m, kernel,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[0, :, :, 0]


def dilate_valid_centers(mask: jax.Array, kernel_size: int = 7) -> jax.Array:
    """Training-side valid-center map: nonzero of the box count (dilation).

    Returns a float32 HW map in {0,1}; its nonzero coordinates are the valid
    patch centers, ordering matching torch ``nonzero`` row-major semantics
    (reference dataset.py:170).
    """
    return (box_count_map(mask, kernel_size) > 0).astype(jnp.float32)


def erode_full_support(
    mask: jax.Array,
    kernel_size: int = 7,
    threshold: float = 0.4,
) -> jax.Array:
    """Inference-side mask processing (reference generator.py:327-351).

    Values below ``threshold`` are zeroed, then a pixel survives only when its
    entire kxk neighbourhood is nonzero; output normalized by k*k so interior
    values of a binary mask become exactly 1.0.
    """
    m = jnp.where(mask < threshold, 0.0, mask.astype(jnp.float32))
    counts = box_count_map(m, kernel_size)
    full = float(kernel_size * kernel_size)
    counts = jnp.where(counts < full, 0.0, counts)
    return counts / full


def erode_full_support_np(
    mask,
    kernel_size: int = 7,
    threshold: float = 0.4,
):
    """Host-side ``erode_full_support`` for BINARY masks (numpy, no device).

    The inference engine's per-frame mask path used the device op, which
    costs a ~2 MB fp32 upload + ~2 MB readback through slow transports
    (axon tunnel: 25-42 MB/s) before the real uint8 mask upload even
    happens. ``load_mask`` binarizes (>128 -> {0,1}), and for a {0,1} mask
    the 7x7 zero-padded window sum is a small integer — exact in any
    arithmetic order — so this host version is bit-identical to the XLA
    conv (reference semantics: generator.py:327-351). Raises on non-binary
    input; use the device op for fractional masks.
    """
    import numpy as np

    m = np.asarray(mask, np.float32)
    m = np.where(m < threshold, 0.0, m)
    u = np.unique(m)
    if not np.isin(u, (0.0, 1.0)).all():
        raise ValueError(
            "erode_full_support_np requires a binary {0,1} mask after "
            f"thresholding (got values {u[:8]}); use erode_full_support")
    k, pad = kernel_size, kernel_size // 2

    def wsum(a, axis):
        ap = np.pad(a, [(pad, pad) if i == axis else (0, 0)
                        for i in range(a.ndim)])
        out = np.zeros(a.shape, np.uint16)
        n = a.shape[axis]
        sl = [slice(None)] * a.ndim
        for off in range(k):
            sl[axis] = slice(off, off + n)
            out += ap[tuple(sl)]
        return out

    counts = wsum(wsum(m.astype(np.uint16), 0), 1)
    return (counts == k * k).astype(np.float32)
