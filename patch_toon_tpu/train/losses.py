"""Loss criteria registry (torch-name compatible).

The reference instantiates criteria by torch class name from config
(lightning_model.py:48-54, ``reconstruction_criterion: L1Loss`` /
``adversarial_criterion: MSELoss`` in config/training/default.yaml:12-13).
This registry accepts the same names; all reductions are means in fp32.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

LossFn = Callable[[jax.Array, jax.Array], jax.Array]


def _f32(a: jax.Array, b: jax.Array):
    return a.astype(jnp.float32), b.astype(jnp.float32)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    p, t = _f32(pred, target)
    return jnp.mean(jnp.abs(p - t))


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    p, t = _f32(pred, target)
    return jnp.mean(jnp.square(p - t))


def smooth_l1_loss(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    p, t = _f32(pred, target)
    d = jnp.abs(p - t)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def bce_with_logits_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    p, t = _f32(pred, target)
    return jnp.mean(jnp.maximum(p, 0) - p * t + jnp.log1p(jnp.exp(-jnp.abs(p))))


CRITERIA: dict = {
    "L1Loss": l1_loss,
    "MSELoss": mse_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "BCEWithLogitsLoss": bce_with_logits_loss,
}


def get_criterion(name: str) -> LossFn:
    if name not in CRITERIA:
        raise ValueError(f"Unknown criterion {name!r}; known: {sorted(CRITERIA)}")
    return CRITERIA[name]
