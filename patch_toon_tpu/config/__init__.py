"""Hydra-compatible YAML config composition (no hydra/omegaconf dependency).

Mirrors the surface the reference uses (reference: config/config.yaml:2-18,
train.py:51, generator.py:707): a root config with a ``defaults`` list of
config groups, ``${a.b}`` interpolation, ``${now:%fmt}`` resolvers, and CLI
dotlist overrides (``training.batch_size=40``, ``data=miku``).
"""

from patch_toon_tpu.config.compose import (
    ConfigNode,
    compose,
    load_yaml,
    merge,
    resolve,
    save,
    to_container,
)

__all__ = [
    "ConfigNode",
    "compose",
    "load_yaml",
    "merge",
    "resolve",
    "save",
    "to_container",
]
