"""Golden regression tests: numerics must not drift between rounds.

Goldens are recorded by tools/record_goldens.py (CPU fp32). Re-record ONLY
after an intentional numerics change, and say why in the commit message.
"""

import pathlib

import numpy as np
import pytest

GOLDEN_PATH = pathlib.Path(__file__).resolve().parent / "goldens" / "goldens.npz"


@pytest.fixture(scope="module")
def goldens():
    if not GOLDEN_PATH.exists():
        pytest.skip("goldens not recorded")
    return np.load(GOLDEN_PATH)


def test_inference_golden(goldens):
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
    from record_goldens import compute_goldens

    current = compute_goldens()
    want = goldens["inference_frame"]
    got = current["inference_frame"]
    assert got.shape == want.shape
    # uint8: allow 1-count rounding jitter across XLA versions
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    mismatched = (got != want).mean()
    assert mismatched < 0.01, f"{mismatched:.2%} pixels drifted"

    np.testing.assert_allclose(
        current["training_losses"], goldens["training_losses"],
        rtol=2e-4, atol=2e-4)
