"""Worker for the 2-process DCN simulation test (spawned by test_dcn.py).

Each process owns 4 virtual CPU devices; together they form a Gloo-backed
jax.distributed cluster with a ('dcn'=2, 'data'=4, 'model'=1) hybrid mesh —
the same code path as a real multi-slice TPU pod minus the transport.

Phase 1: explicit global batch -> one GAN train step -> assert the reduced
gradients leave every process with identical parameters.
Phase 2: full `fit()` on a tiny synthetic scene (fused in-jit sampler with
('dcn','data') out-shardings, process-0-only checkpoints/TB).
"""

import json
import os
import sys
from pathlib import Path

PROC_ID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = int(sys.argv[3])
TMP = Path(sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
# drop any inherited device-count flag (pytest's conftest exports 8)
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(_flags)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=NPROCS, process_id=PROC_ID)

import numpy as np
from jax.experimental import multihost_utils

from patch_toon_tpu.parallel import make_dcn_mesh, make_global_batch, replicate
from patch_toon_tpu.train import StyleTransferModel, make_train_step

assert jax.device_count() == 4 * NPROCS, jax.device_count()
assert jax.local_device_count() == 4

mesh = make_dcn_mesh()  # auto: dcn=NPROCS granules, data=4, model=1
assert mesh.axis_names == ("dcn", "data", "model")
assert dict(mesh.shape) == {"dcn": NPROCS, "data": 4, "model": 1}


def tiny_model(batch_size):
    return StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(
            input_channels=6, use_bias=True, tanh=True, append_smoothers=True,
            resnet_blocks=1, filters=[8, 16, 16, 16, 16, 8],
            norm_layer="instance_norm")},
        discriminator_config={"type": "DiscriminatorN_IN", "args": dict(
            num_filters=8, n_layers=2, use_noise=False,
            norm_layer="instance_norm", use_bias=True, input_channels=3)},
        training_config=dict(
            batch_size=batch_size, reconstruction_weight=4.0,
            adversarial_weight=0.5, use_image_loss=True,
            reconstruction_criterion="L1Loss",
            adversarial_criterion="MSELoss", precision=32,
            max_steps=2, log_every_n_steps=1, image_log_freq=10 ** 6),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
            discriminator=dict(lr=4e-4, betas=[0.9, 0.999],
                               weight_decay=1e-5)),
        data_config=dict(patch_size=16, additional_channels={
            "point_vector": {"path": "unused", "depth": 3}}),
        perception_loss_config=None,
    )


# ---- Phase 1: explicit global batch through one GAN step ------------------

GLOBAL_BATCH = 16
LOCAL = GLOBAL_BATCH // NPROCS
model = tiny_model(GLOBAL_BATCH)

with mesh:
    state = replicate(model.init_state(jax.random.PRNGKey(0), patch_size=16),
                      mesh)
    rng = np.random.default_rng(100 + PROC_ID)  # DIFFERENT data per process
    local = {
        "pre": rng.uniform(-1, 1, (LOCAL, 16, 16, 3)).astype(np.float32),
        "post": rng.uniform(-1, 1, (LOCAL, 16, 16, 3)).astype(np.float32),
        "channels": rng.uniform(-1, 1, (LOCAL, 16, 16, 3)).astype(np.float32),
    }
    batch = make_global_batch(local, mesh)
    assert batch["pre"].shape[0] == GLOBAL_BATCH

    step = make_train_step(model, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)

g_loss = float(metrics["g_total_loss"])
d_loss = float(metrics["d_total_loss"])
assert np.isfinite(g_loss) and np.isfinite(d_loss)

# after the psum'd update, params must be bit-identical on every process
param_sum = float(sum(float(np.asarray(x).astype(np.float64).sum())
                      for x in jax.tree.leaves(jax.device_get(state.g_params))))
all_sums = multihost_utils.process_allgather(np.float64(param_sum))
assert np.all(all_sums == all_sums[0]), all_sums

# ---- Phase 2: full fit() on a synthetic scene (fused sampler + ckpt) ------

scene = TMP / "scene"
if PROC_ID == 0:
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from make_sample_scene import make_scene

    make_scene(str(scene), frames=3, height=48, width=64)
multihost_utils.sync_global_devices("scene_ready")

from patch_toon_tpu.data import StyleTransferDataset
from patch_toon_tpu.train.loop import fit

dataset = StyleTransferDataset(
    dir_pre=str(scene / "input"), dir_post=str(scene / "output"),
    dir_mask=str(scene / "mask"), patch_size=16,
    additional_channels={"point_vector": {"path": str(scene / "tracking"),
                                          "depth": 3}},
)
run_dir = TMP / "run"
final = fit(tiny_model(GLOBAL_BATCH), dataset, run_dir=str(run_dir),
            mesh=mesh, max_epochs=1, progress=False)
multihost_utils.sync_global_devices("fit_done")
assert int(jax.device_get(final.step)) == 2
if PROC_ID == 0:
    assert (run_dir / "checkpoints" / "last").exists()

print(json.dumps({"proc": PROC_ID, "g_loss": g_loss, "d_loss": d_loss,
                  "param_sum": param_sum, "ok": True}), flush=True)
