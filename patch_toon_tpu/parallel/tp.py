"""Tensor parallelism: conv channel sharding over the mesh 'model' axis.

The models here are small (SURVEY.md §2b: "TP is a capability, not a
need"), so TP is implemented the lightweight GSPMD way: parameter shardings
partition every conv kernel's output-channel dim (HWIO -> 'model' on O) and
its bias; under jit, XLA partitions the convs channel-wise and inserts the
all-gathers/reduces where layers consume full activations. No model code
changes — any GeneratorJ/DiscriminatorN_IN params tree works.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_sharding(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """NamedSharding tree: conv kernels sharded on output channels.

    Kernels (4D HWIO) shard O over ``axis`` when divisible; 1D biases/scales
    shard when divisible; everything else (norm stats, heads with 3 output
    channels) replicates.
    """
    size = mesh.shape[axis]

    def spec(path, leaf):
        shape = np.shape(leaf)
        if len(shape) == 4 and shape[3] % size == 0 and shape[3] >= size:
            return NamedSharding(mesh, P(None, None, None, axis))
        if len(shape) == 1 and shape[0] % size == 0 and shape[0] >= size:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put the params with TP shardings."""
    shardings = tp_param_sharding(params, mesh, axis)
    return jax.tree.map(jax.device_put, params, shardings)
