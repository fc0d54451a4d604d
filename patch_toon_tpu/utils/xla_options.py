"""Per-compile XLA option tuning for the hot jitted programs.

XLA's fusion/scheduling choices at this model's shapes are a compilation
lottery (docs/perf/xla_sweep.json: the same program compiled with different
scoped-VMEM limits varies ~2x; even recompiling identically drifts).
``tools/ab_xla_flags.py`` measures candidates with interleaved minima on the
real chip; the winner ships here as the default for TPU backends, overridable
per-run via ``inference.xla_options`` / ``training.xla_options``:

  auto  -> TUNED_TPU_OPTIONS on TPU, nothing elsewhere (default)
  none  -> compiler defaults
  {k:v} -> exact option dict (values stringified)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

# Winner of tools/ab_xla_flags.py on v5e (docs/perf/xla_ab*.json): raising
# the scoped-VMEM budget lets the conv fusions tile without HBM round-trips
# at the generator's 80x80 tile shapes. 28 MiB vs default: generator -17%
# (131 -> ~108 us/tile at B=512), full multiframe tiled program -19%
# (23.3 -> 19.0 ms/frame min); 28 vs 32 MiB is a wash on the bare generator
# but ~6% better on the full program; >=48 MiB is catastrophic (10x);
# train step insensitive (+-0.4%).
TUNED_TPU_OPTIONS: Dict[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "28672",
}


def resolve_xla_options(cfg_value: Any = "auto",
                        backend: Optional[str] = None
                        ) -> Optional[Dict[str, str]]:
    """Map a config knob to a jax.jit ``compiler_options`` dict (or None)."""
    if cfg_value in ("none", "off", False):
        return None
    if cfg_value in ("auto", None, True):
        backend = backend or jax.default_backend()
        return dict(TUNED_TPU_OPTIONS) if backend == "tpu" else None
    if isinstance(cfg_value, dict):
        return {str(k): str(v) for k, v in cfg_value.items()}
    raise ValueError(f"Unknown xla_options value: {cfg_value!r}")
