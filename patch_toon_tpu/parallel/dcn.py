"""Multi-host / multi-slice (DCN) distributed runtime.

The reference is strictly single-device (SURVEY.md §2b — no
torch.distributed anywhere); this build's blueprint promises pod-scale
streaming (BASELINE.json config #5), which on TPU means multiple slices
joined over DCN (data-center network) while chips within a slice talk over
ICI. The recipe:

- ``jax.distributed.initialize`` once per process, before any device query
  (auto-detects coordinator/process-id on real TPU pods; explicit args
  support CPU simulation and bare-metal);
- a ('dcn', 'data', 'model') mesh built with
  ``mesh_utils.create_hybrid_device_mesh`` so the outer axis maps to slice
  granules: batch arrays shard over ('dcn', 'data'), so XLA's gradient psum
  runs hierarchically — reduce-scatter over ICI inside each slice, one
  smaller all-reduce over DCN between slices;
- dataset keyframes replicate per-process (every host feeds the same
  device-resident tables, the fused in-jit sampler needs no host data path
  at all — the only cross-host traffic is the gradient reduction).

CPU simulation: two local processes with ``xla_force_host_platform_device_
count`` form a Gloo-backed cluster (tests/test_dcn.py) — the same code path
as a real pod minus the transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join (or form) the multi-host cluster. Idempotent.

    On real TPU pods call with no args — everything is auto-detected from
    the TPU metadata. Explicit args are for CPU simulation / bare metal.
    """
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = str(coordinator_address)
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = [int(i) for i in local_device_ids]
    jax.distributed.initialize(**kwargs)


def num_granules(devices: Optional[Sequence[jax.Device]] = None) -> int:
    """Number of DCN granules.

    Real TPUs: one granule per slice (ICI spans a whole slice even across
    hosts; DCN only connects slices). CPU simulation: one per process (CPU
    devices all report slice_index=0 regardless of process)."""
    devices = list(devices if devices is not None else jax.devices())
    if devices[0].platform == "cpu":
        return len({d.process_index for d in devices})
    return len({getattr(d, "slice_index", 0) for d in devices})


def make_dcn_mesh(
    data: int = -1,
    model: int = 1,
    dcn: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('dcn', 'data', 'model') hybrid mesh.

    ``dcn`` = number of slices/processes on the slow axis (-1 = detect);
    ``data`` = per-granule data-parallel width (-1 = all remaining chips).
    Device order inside each granule follows the physical ICI topology via
    ``mesh_utils.create_hybrid_device_mesh``.
    """
    from jax.experimental import mesh_utils

    devices = list(devices if devices is not None else jax.devices())
    granules = num_granules(devices) if dcn == -1 else int(dcn)
    per_granule = len(devices) // max(1, granules)
    if data == -1:
        if per_granule % model:
            raise ValueError(
                f"{per_granule} devices/granule not divisible by model={model}")
        data = per_granule // model
    use = devices[: granules * data * model]
    if granules == num_granules(devices) and granules > 1:
        # granule attribute: real TPU slices expose distinct slice_index;
        # simulated CPU clusters group by process instead
        arr = mesh_utils.create_hybrid_device_mesh(
            (1, data, model),
            dcn_mesh_shape=(granules, 1, 1),
            devices=use,
            process_is_granule=devices[0].platform == "cpu",
        )
    else:
        # explicit granule count that doesn't match the physical slice
        # structure: a single-process simulation (dryrun) — plain reshape
        arr = np.asarray(use).reshape(granules, data, model)
    return Mesh(arr, axis_names=("dcn", "data", "model"))


def make_global_batch(batch, mesh: Mesh):
    """Assemble a global sharded batch from per-process local shards.

    Each process passes ITS batch slice (global_batch / process_count
    rows); the result is one global jax.Array sharded over ('dcn','data').
    Single-process meshes fall back to a plain device_put.
    """
    from patch_toon_tpu.parallel.mesh import batch_sharding, shard_batch

    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sh = batch_sharding(mesh)

    def to_global(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(to_global, batch)
