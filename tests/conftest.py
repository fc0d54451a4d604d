"""Test configuration: run JAX on a simulated 8-device CPU mesh.

This is the TPU-world "fake backend" (SURVEY.md §4): all sharding/collective
tests execute against 8 virtual CPU devices so multi-chip code paths compile
and run without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax

# The axon TPU plugin (sitecustomize) prepends itself to jax_platforms even
# when JAX_PLATFORMS=cpu is set; force CPU explicitly for the test mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)


REFERENCE_DIR = pathlib.Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE_DIR.exists()


@pytest.fixture(scope="session")
def reference_path() -> pathlib.Path:
    if not has_reference():
        pytest.skip("reference repo not available")
    return REFERENCE_DIR
