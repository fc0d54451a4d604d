"""Train state: both networks' params, optimizer states, and BN stats.

One flax struct so the whole GAN step is a single pure function
``(state, batch, rng) -> (state, metrics)`` — the jit/pjit unit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct


@struct.dataclass
class GANTrainState:
    step: jax.Array                      # int32 scalar
    g_params: Any
    g_batch_stats: Any                   # {} when append_smoothers=False
    g_opt: Any
    d_params: Optional[Any] = None       # None when no discriminator configured
    d_opt: Optional[Any] = None
    vgg_params: Optional[Any] = None     # frozen (never updated)
