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

# Winner of tools/ab_xla_flags.py on v5e (see docs/perf/xla_ab.json):
# raising the scoped-VMEM budget to 32 MiB lets the conv fusions tile
# without HBM round-trips at the generator's 80x80 tile shapes.
TUNED_TPU_OPTIONS: Dict[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "32768",
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
