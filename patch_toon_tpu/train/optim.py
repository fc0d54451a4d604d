"""Optimizers with torch semantics.

The reference uses ``torch.optim.Adam(lr, betas, weight_decay)`` per network
(lightning_model.py:323-341) with manual ``clip_grad_norm_`` before each step
(lightning_model.py:229-248). Torch Adam's ``weight_decay`` is *coupled* L2
(wd*param added to the gradient before the moment updates), which in optax is
``add_decayed_weights`` placed BEFORE ``scale_by_adam`` — not AdamW.

The chain therefore is: clip_by_global_norm -> add_decayed_weights ->
scale_by_adam(eps=1e-8) -> scale(-lr), matching the torch update order
exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def torch_adam(
    lr: float,
    betas: Sequence[float] = (0.9, 0.999),
    weight_decay: float = 0.0,
    eps: float = 1e-8,
    clip_norm: Optional[float] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale(-lr))
    tx = optax.chain(*parts)
    if accumulate_steps > 1:
        # gradient accumulation (reference train.py:96 accumulate_grad_batches)
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def from_config(
    opt_cfg: dict,
    clip_norm: Optional[float] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """Build from the config/optimizer/default.yaml per-network schema."""
    return torch_adam(
        lr=float(opt_cfg["lr"]),
        betas=tuple(opt_cfg.get("betas", (0.9, 0.999))),
        weight_decay=float(opt_cfg.get("weight_decay", 0.0)),
        clip_norm=clip_norm,
        accumulate_steps=accumulate_steps,
    )
