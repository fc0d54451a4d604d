#!/usr/bin/env python
"""Launcher: start TensorBoard, then training — reference run_training.py.

Spawns a TensorBoard server on 0.0.0.0:6006 with atexit cleanup (reference
run_training.py:22-46), prints the LAN URL (run_training.py:10-20), then runs
``train.py`` as a subprocess (run_training.py:63), forwarding CLI overrides.
"""

from __future__ import annotations

import atexit
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent


def get_lan_ip() -> str:
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.connect(("10.255.255.255", 1))
        ip = s.getsockname()[0]
        s.close()
        return ip
    except Exception:
        return "127.0.0.1"


def start_tensorboard(logdir: str = "outputs", port: int = 6006):
    try:
        proc = subprocess.Popen(
            [sys.executable, "-m", "tensorboard.main",
             "--logdir", logdir, "--host", "0.0.0.0", "--port", str(port)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    except Exception as e:
        print(f"TensorBoard unavailable: {e}")
        return None
    atexit.register(proc.terminate)
    print(f"TensorBoard: http://{get_lan_ip()}:{port}")
    return proc


def main() -> None:
    start_tensorboard()
    result = subprocess.run(
        [sys.executable, str(REPO / "train.py"), *sys.argv[1:]])
    sys.exit(result.returncode)


if __name__ == "__main__":
    main()
