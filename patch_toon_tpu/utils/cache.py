"""Persistent XLA compilation cache setup.

First compiles of the train step / frame programs take tens of seconds
(more through remote TPU transports); enabling JAX's persistent compilation
cache makes every later process start warm. Called by the CLI entrypoints.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    path = Path(
        cache_dir
        or os.environ.get("PATCH_TOON_CACHE")
        or Path.home() / ".cache" / "patch_toon_tpu" / "xla_cache"
    )
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compilation cache unavailable: {e}")
