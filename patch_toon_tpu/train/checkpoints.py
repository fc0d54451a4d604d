"""Orbax checkpointing with the reference's retention policy and
self-describing channel metadata.

Mirrors the reference setup (train.py:22-31): keep the top-3 checkpoints by
``g_total_loss`` plus an always-current ``last`` — and the reference's
channel self-description trick (generator.py:115-129: inference reads the
generator's input-channel width out of the checkpoint itself) via a JSON
``meta`` sidecar carrying the resolved generator/discriminator args.

Also loads reference-framework torch ``.ckpt`` files transparently (see
StyleTransferModel.load_torch_checkpoint).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from patch_toon_tpu.train.state import GANTrainState


def _state_tree(state: GANTrainState) -> Dict[str, Any]:
    tree = {
        "step": state.step,
        "g_params": state.g_params,
        "g_batch_stats": state.g_batch_stats,
        "g_opt": state.g_opt,
    }
    if state.d_params is not None:
        tree["d_params"] = state.d_params
        tree["d_opt"] = state.d_opt
    return tree


class CheckpointManager:
    """top-k-by-score + last retention over orbax StandardCheckpointer."""

    def __init__(self, directory: str, keep_top_k: int = 3,
                 meta: Optional[Dict[str, Any]] = None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.keep_top_k = keep_top_k
        self.meta = meta or {}
        self._ckptr = ocp.StandardCheckpointer()
        # Rebuild retention scores from meta.json sidecars so top-k pruning
        # keeps working across resume_from restarts (pre-resume epochs count).
        self._scores: Dict[str, float] = {}
        for path in sorted(self.directory.glob("epoch_*")):
            meta = self.read_meta(str(path))
            if "g_total_loss" in meta:
                self._scores[path.name] = float(meta["g_total_loss"])

    @staticmethod
    def _primary() -> bool:
        return jax.process_index() == 0

    @staticmethod
    def _sync(tag: str) -> None:
        """Cross-process barrier (no-op single-process). Orbax's own save has
        an internal barrier, so in a multi-host run ALL processes must call
        save(); only process 0 mutates the filesystem around it."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    def _write(self, name: str, state: GANTrainState,
               extra_meta: Dict[str, Any]) -> Path:
        path = self.directory / name
        if path.exists() and self._primary():
            shutil.rmtree(path)
        self._sync(f"ckpt_clear_{name}")
        self._ckptr.save(path, _state_tree(state))
        self._ckptr.wait_until_finished()
        if self._primary():
            with open(path / "meta.json", "w") as f:
                json.dump({**self.meta, **extra_meta}, f, indent=2,
                          default=str)
        return path

    def save(self, state: GANTrainState, epoch: int, score: float) -> None:
        """Save 'last' plus an epoch checkpoint subject to top-k retention.

        In multi-host runs every process must call this (orbax coordinates
        the write internally); retention decisions are identical everywhere
        since the score is replicated, but only process 0 prunes.
        """
        extra = {"epoch": epoch, "g_total_loss": float(score)}
        self._write("last", state, extra)
        name = f"epoch_{epoch:04d}"
        self._write(name, state, extra)
        self._scores[name] = float(score)
        while len(self._scores) > self.keep_top_k:
            worst = max(self._scores, key=self._scores.get)
            self._scores.pop(worst)
            if self._primary():
                shutil.rmtree(self.directory / worst, ignore_errors=True)

    # ------------------------------------------------------------------

    @staticmethod
    def read_meta(path: str) -> Dict[str, Any]:
        meta_file = Path(path) / "meta.json"
        if meta_file.exists():
            with open(meta_file) as f:
                return json.load(f)
        return {}

    @staticmethod
    def restore(path: str, state: GANTrainState) -> GANTrainState:
        """Restore into an existing (shape-compatible) state."""
        ckptr = ocp.StandardCheckpointer()
        target = _state_tree(state)
        restored = ckptr.restore(Path(path).absolute(), target)
        updates = {
            "step": restored["step"],
            "g_params": restored["g_params"],
            "g_batch_stats": restored["g_batch_stats"],
            "g_opt": restored["g_opt"],
        }
        if "d_params" in restored and state.d_params is not None:
            updates["d_params"] = restored["d_params"]
            updates["d_opt"] = restored["d_opt"]
        return state.replace(**updates)


def _local_checkpointer() -> ocp.StandardCheckpointer:
    """A checkpointer whose barriers are process-LOCAL.

    Multi-host pod inference partitions frames across hosts with zero
    communication (infer.engine.process_directory); each process restores the
    (identical, read-only) checkpoint independently. Orbax's default restore
    inserts a cross-process barrier, which both serializes the hosts and
    deadlocks if they reach restore at different times — a single-member
    ``active_processes`` set makes orbax skip every barrier."""
    me = jax.process_index()
    return ocp.StandardCheckpointer(
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me}))


def restore_generator(path: str) -> Tuple[Any, Any]:
    """Raw-restore only the generator (params, batch_stats) from an orbax dir.

    Used by inference, where the restore target has no discriminator/optimizer
    state (the checkpoint may have been written by a full GAN training run).
    """
    ckptr = _local_checkpointer()
    p = Path(path).absolute()
    if jax.process_count() > 1:
        # The saved sharding metadata names the WRITER's devices; restore
        # against an abstract target pinned to this process's device 0
        # instead (params are replicated to the local mesh afterwards).
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding),
            dict(ckptr.metadata(p).item_metadata),
        )
        restored = ckptr.restore(p, abstract)
    else:
        restored = ckptr.restore(p)
    return restored["g_params"], restored.get("g_batch_stats", {})


def sniff_input_channels(ckpt_path: str) -> Optional[int]:
    """Read the generator input-channel width from any supported checkpoint.

    Equivalent of reference generator.py:118-119 (state_dict weight-shape
    sniff), for orbax dirs (meta.json / kernel shape) and torch .ckpt files.
    """
    p = Path(ckpt_path)
    if p.is_dir():
        meta = CheckpointManager.read_meta(ckpt_path)
        if "input_channels" in meta:
            return int(meta["input_channels"])
        ckptr = _local_checkpointer()
        try:
            # Shape-only metadata read: no array data leaves disk.
            md = ckptr.metadata(p.absolute())
            tree = getattr(md, "item_metadata", md)
            kernel = tree["g_params"]["initial_conv"]["conv"]["kernel"]
            return int(kernel.shape[2])  # HWIO -> I
        except Exception:
            restored = ckptr.restore(p.absolute())
            kernel = restored["g_params"]["initial_conv"]["conv"]["kernel"]
            return int(np.asarray(kernel).shape[2])
    # torch .ckpt
    import torch

    from patch_toon_tpu.utils.torch_compat import (
        generator_input_channels_from_torch,
    )

    ckpt = torch.load(str(p), map_location="cpu", weights_only=False)
    return generator_input_channels_from_torch(ckpt["state_dict"])
