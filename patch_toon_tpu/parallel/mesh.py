"""Device mesh + sharding helpers: the framework's communication layer.

The reference has no distributed backend at all (single device pinned,
config/training/default.yaml:25-27; no torch.distributed anywhere — SURVEY.md
§2b). In this build, scale-out is first-class and TPU-native: a
``jax.sharding.Mesh`` with a ``data`` axis over ICI (and an optional ``model``
axis), batch arrays sharded over ``data``, parameters replicated, and XLA
GSPMD inserting the gradient ``psum`` and any other collectives. Multi-slice
(DCN) runs add ``jax.distributed.initialize`` before mesh creation.

Training: the global patch batch is sharded over ``data``; each chip gathers
its shard's patches from its own (replicated) HBM-resident keyframes — the
sampler is jitted with sharded out_shardings so gathers stay local.
Inference: frame tiles shard over the same axis (see infer.engine).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh; data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    use = data * model
    if use > n:
        raise ValueError(f"mesh {data}x{model} needs {use} devices, have {n}")
    arr = np.asarray(devices[:use]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data' (and 'dcn' when the mesh is
    multi-slice), everything else replicated."""
    if "dcn" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put every array in a batch pytree with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / train state) across the mesh.

    Multi-process meshes build global arrays from (identical) process-local
    values; single-process meshes are a plain device_put.
    """
    sh = replicated_sharding(mesh)
    if jax.process_count() > 1 and not sh.is_fully_addressable:
        def rep(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(sh, x, x.shape)
        return jax.tree.map(rep, tree)
    # single process, or a process-LOCAL mesh inside a multi-host run
    # (pod inference shards frames across hosts instead of devices)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
