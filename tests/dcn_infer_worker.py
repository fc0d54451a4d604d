"""Worker for the 2-process multi-host pod INFERENCE test (test_dcn.py).

Drives the real ``generator.py`` CLI with ``parallel.dcn.enabled=true``:
each process joins the jax.distributed cluster, auto-takes its round-robin
file shard (engine.process_directory), and stylizes it on a LOCAL 4-device
('data') mesh via the pod tiled program — the true multi-host streaming
path (stateless per-frame work, zero cross-host collectives).
"""

import os
import sys
from pathlib import Path

PROC_ID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = int(sys.argv[3])
TMP = Path(sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(_flags)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import generator  # noqa: E402

generator.main([
    f"paths.checkpoint={TMP}/ckpt/last",
    f"paths.input_dir={TMP}/scene/input",
    f"paths.mask_dir={TMP}/scene/mask",
    f"paths.output_dir={TMP}/styl_pod",
    "paths.additional_channels={}",
    "data.patch_size=16",
    "inference.use_gpu=false",
    "inference.precision=32",
    "inference.devices=-1",
    "parallel.dcn.enabled=true",
    f"parallel.dcn.coordinator_address=localhost:{PORT}",
    f"parallel.dcn.num_processes={NPROCS}",
    f"parallel.dcn.process_id={PROC_ID}",
])

import jax  # noqa: E402

assert jax.process_count() == NPROCS, jax.process_count()
assert jax.local_device_count() == 4
print(f"WORKER_OK {PROC_ID}", flush=True)
