"""The training loop: epochs, logging, checkpoints, early stopping.

TPU-native equivalent of the reference's ``pl.Trainer`` usage
(train.py:89-105) plus its callbacks (train.py:15-49): per-epoch top-3 +
last checkpointing on ``g_total_loss``, optional early stopping (patience in
epochs), scalar logging every ``log_every_n_steps``, comparison-grid image
logging every ``image_log_freq`` steps.

Everything device-side is three jitted programs: the batch sampler, the GAN
train step, and an eval-mode generator forward for image logging. With a
multi-chip mesh, the batch is sharded over the ``data`` axis and the state is
replicated; XLA inserts the gradient psum.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from patch_toon_tpu.data.dataset import StyleTransferDataset
from patch_toon_tpu.parallel.mesh import replicate
from patch_toon_tpu.train.checkpoints import CheckpointManager
from patch_toon_tpu.train.logging import MetricsLogger, build_comparison_grid
from patch_toon_tpu.train.model import StyleTransferModel
from patch_toon_tpu.train.state import GANTrainState
from patch_toon_tpu.train.step import make_train_step


def fit(
    model: StyleTransferModel,
    dataset: StyleTransferDataset,
    run_dir: str,
    mesh: Optional[Any] = None,
    seed: int = 0,
    max_epochs: Optional[int] = None,
    resume_from: Optional[str] = None,
    progress: bool = True,
) -> GANTrainState:
    tc = model.training_config
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)

    batch_size = int(tc["batch_size"])
    max_epochs = int(max_epochs if max_epochs is not None else tc.get("max_epochs", 50))
    log_every = int(tc.get("log_every_n_steps", 10))
    image_log_freq = int(tc.get("image_log_freq", 100))
    early_stopping = bool(tc.get("early_stopping", False))
    patience = int(tc.get("early_stopping_patience", 2))

    # multi-host (DCN): every process runs the identical loop on its local
    # devices; only process 0 touches disk (TB, checkpoints, prints)
    primary = jax.process_index() == 0
    multihost = jax.process_count() > 1

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    state = model.init_state(init_rng, patch_size=dataset.patch_size)
    if resume_from:
        state = CheckpointManager.restore(resume_from, state)
        if primary:
            print(f"Resumed from {resume_from} at step {int(state.step)}")

    if mesh is not None:
        state = replicate(state, mesh)
        if multihost:
            dataset.replicate_to_mesh(mesh)

    # Uniform sampling fuses the patch gather INTO the jitted train step
    # (one dispatch per step); permutation mode keeps host index bookkeeping
    # so it samples separately and feeds the batch in.
    fused = dataset.sampling == "uniform"
    two_forward = bool(tc.get("two_forward", False))
    if fused:
        from patch_toon_tpu.parallel.mesh import batch_sharding as _bs

        step_fn = make_train_step(
            model,
            sampler=lambda r: dataset.sample_batch(r, batch_size),
            batch_sharding=_bs(mesh) if mesh is not None else None,
            two_forward=two_forward,
        )
        sample = None
    else:
        sample = dataset.make_sampler(batch_size, mesh)
        step_fn = make_train_step(model, two_forward=two_forward)

    # jitted eval-mode forward + standalone sampler for image logging
    eval_forward = jax.jit(
        lambda params, stats, x: model.generator.apply(
            {"params": params, "batch_stats": stats},
            x.astype(model.dtype or jnp.float32), train=False))
    log_sampler = jax.jit(lambda r: dataset.sample_batch(r, batch_size))

    ckpt = CheckpointManager(
        run_dir / "checkpoints",
        keep_top_k=3,
        meta={
            "input_channels": model.input_channels,
            "generator_args": model.generator_args,
            "discriminator_args": model.discriminator_args,
            "patch_size": dataset.patch_size,
        },
    )
    logger = MetricsLogger(str(run_dir / "tb") if primary else None)
    channel_depths = [d for _, _, d in dataset.channel_items]

    steps_per_epoch = dataset.steps_per_epoch(batch_size)
    # optional GLOBAL step cap (smoke runs): training stops once the total
    # step count reaches it, however many epochs that spans
    max_steps = int(tc.get("max_steps") or 0)
    # top-k checkpoint score: "last_step" = the epoch's final per-step
    # g_total_loss (lightning ModelCheckpoint parity, PARITY_NOTES #18),
    # "epoch_mean" / "epoch_min" = smoother alternatives
    score_mode = str(tc.get("checkpoint_score", "last_step"))
    if score_mode not in ("last_step", "epoch_mean", "epoch_min"):
        raise ValueError(
            f"training.checkpoint_score={score_mode!r}: expected "
            "last_step, epoch_mean or epoch_min")
    best_score = float("inf")
    epochs_without_improvement = 0
    global_step = int(state.step)
    # resume continues the epoch numbering (lightning resume semantics) so
    # a resumed run never overwrites pre-resume epoch checkpoints. The
    # epoch comes from the checkpoint's meta sidecar — deriving it from
    # step // steps_per_epoch breaks when a global max_steps made the
    # pre-resume epochs shorter than steps_per_epoch.
    start_epoch = 0
    if resume_from:
        meta = CheckpointManager.read_meta(resume_from) or {}
        start_epoch = (int(meta["epoch"]) + 1 if "epoch" in meta
                       else global_step // steps_per_epoch)

    if primary:
        print(f"Training: {max_epochs} epochs x {steps_per_epoch} steps, "
              f"batch {batch_size}, {dataset.num_images} keyframes, "
              f"{len(dataset)} patch centers")

    # optional jax.profiler trace of the first training steps
    # (training.profile_dir knob — the reference has no profiler at all,
    # SURVEY.md §5 "Tracing / profiling: none")
    profile_dir = tc.get("profile_dir")
    if profile_dir:
        jax.profiler.start_trace(str(profile_dir))

    # reference LearningRateMonitor scalar (train.py:34-36) — constant lr,
    # read from the optimizer config that actually builds the Adam (an
    # optimizer.generator.lr override must show up here, not a stale
    # training.learning_rate)
    lr = float(model.optimizer_config["generator"].get("lr", 0.0) or 0.0)

    # Async observability: the per-step scalar fetch is a full host<->device
    # round trip, and through a remote transport (the axon tunnel) that RTT
    # is ~0.7 s — synced every log_every steps it HALVED the real loop's
    # throughput (r5 soak: 8.8 steps/s vs the step's own ~23/s). All TB
    # writes ride ONE worker thread (ordered, single-writer) fed device
    # futures; the main loop never blocks on logging. Bounded queue so a
    # congested transport back-pressures instead of hoarding device buffers.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    log_pool = ThreadPoolExecutor(max_workers=1)
    log_pending: deque = deque()

    def _submit_log(work) -> None:
        log_pending.append(log_pool.submit(work))
        while len(log_pending) > 8:
            log_pending.popleft().result()
        while log_pending and log_pending[0].done():
            log_pending.popleft().result()  # surface worker exceptions

    stop = False
    for epoch in range(start_epoch, max_epochs):
        steps_this_epoch = steps_per_epoch
        if max_steps:
            steps_this_epoch = min(steps_per_epoch,
                                   max(0, max_steps - global_step))
            if steps_this_epoch == 0:
                break
        # device-side running sum/min: one fused scalar D2H fetch per epoch
        # instead of a burst of per-step fetches (slow over the tunnel)
        epoch_loss_sum = jnp.zeros((), jnp.float32)
        epoch_loss_min = jnp.full((), jnp.inf, jnp.float32)
        t0 = time.perf_counter()
        for _ in range(steps_this_epoch):
            rng, sk, tk = jax.random.split(rng, 3)
            if fused:
                state, metrics = step_fn(state, tk)
            else:
                batch = sample(sk)
                state, metrics = step_fn(state, batch, tk)
            global_step += 1

            epoch_loss_sum = epoch_loss_sum + metrics["g_total_loss"]
            epoch_loss_min = jnp.minimum(epoch_loss_min,
                                         metrics["g_total_loss"])
            if global_step % log_every == 0:
                # single fused transfer (per-scalar fetches each pay a full
                # round trip), started async and fetched on the log worker —
                # the dispatch loop keeps queueing steps meanwhile
                names = list(metrics)
                stacked = jnp.stack([metrics[k] for k in names])
                try:
                    stacked.copy_to_host_async()
                except Exception:
                    pass
                step_now = global_step

                def _log_scalars(stacked=stacked, names=names,
                                 step=step_now):
                    vals = np.asarray(stacked)
                    host = dict(zip(names, vals.astype(float).tolist()))
                    host["lr-Adam"] = lr
                    logger.log_scalars(host, step)

                _submit_log(_log_scalars)

            if global_step % image_log_freq == 0:
                log_batch = batch if not fused else log_sampler(sk)
                x = dataset.model_input(log_batch)
                generated = eval_forward(
                    state.g_params, state.g_batch_stats, x)
                step_now = global_step

                def _log_image(log_batch=log_batch, generated=generated,
                               step=step_now):
                    grid = build_comparison_grid(
                        np.asarray(log_batch["pre"]),
                        np.asarray(generated, np.float32),
                        np.asarray(log_batch["post"]),
                        np.asarray(log_batch["channels"])
                        if "channels" in log_batch else None,
                        channel_depths,
                    )
                    logger.log_image("training/comparison_grid", grid, step)

                _submit_log(_log_image)

        if profile_dir and epoch == 0:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            profile_dir = None
            print(f"Profiler trace of epoch 0 written to {tc['profile_dir']}")

        # one fused fetch for all three epoch scalars (sum, min, last step)
        sums = np.asarray(jnp.stack(
            [epoch_loss_sum, epoch_loss_min, metrics["g_total_loss"]]))
        mean_loss = float(sums[0]) / max(1, steps_this_epoch)
        score = {"last_step": float(sums[2]),
                 "epoch_mean": mean_loss,
                 "epoch_min": float(sums[1])}[score_mode]
        dt = time.perf_counter() - t0
        pps = steps_this_epoch * batch_size / dt
        if progress and primary:
            print(f"epoch {epoch}: g_total_loss={mean_loss:.4f} "
                  f"({dt:.1f}s, {pps:,.0f} patches/s)")
        # same single-writer worker as the step scalars (ordered TB writes)
        _submit_log(lambda mean_loss=mean_loss, pps=pps, step=global_step:
                    logger.log_scalars({"epoch_g_total_loss": mean_loss,
                                        "patches_per_sec": pps}, step))

        if multihost:
            # fully-replicated state is process-local readable: fetch to host
            # so orbax sees plain numpy; ALL processes call save (orbax has
            # an internal barrier) but only process 0 writes/prunes
            ckpt.save(jax.device_get(state), epoch, score)
        else:
            ckpt.save(state, epoch, score)

        if max_steps and global_step >= max_steps:
            if primary:
                print(f"Reached training.max_steps={max_steps}; stopping")
            stop = True

        if score < best_score - 1e-12:
            best_score = score
            epochs_without_improvement = 0
        else:
            epochs_without_improvement += 1
            if early_stopping and epochs_without_improvement >= patience:
                print(f"Early stopping at epoch {epoch} "
                      f"(no improvement for {patience} epochs)")
                break
        if stop:
            break

    log_pool.shutdown(wait=True)  # drain queued TB writes before close
    for f in log_pending:
        f.result()
    logger.close()
    return state
