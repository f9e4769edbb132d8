"""Fused gate_up + gated-activation stacked matmul (SwiGLU epilogue)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from light_vllm_tpu.ops.stacked_matmul_pallas import (
    stacked_matmul_gated, stacked_matmul_gated_supported,
    stacked_quantized_matmul_gated)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("act,ref_fn", [
    ("silu", jax.nn.silu),
    ("gelu_tanh", lambda g: jax.nn.gelu(g, approximate=True)),
])
def test_gated_matches_unfused(rng, act, ref_fn):
    L, K, I, M = 3, 256, 512, 70
    w = jnp.asarray(rng.standard_normal((L, K, 2 * I)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.float32)
    assert stacked_matmul_gated_supported(K, 2 * I, act)
    for li in (0, 2):
        ref = ref_fn(x @ w[li, :, :I]) * (x @ w[li, :, I:])
        got = stacked_matmul_gated(x, w, jnp.int32(li), act=act,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)


def test_quantized_gated_matches_dequant(rng):
    L, K, I, M = 2, 256, 512, 48
    scale = jnp.asarray(rng.uniform(0.01, 0.1, 2 * I), jnp.float32)
    w8 = jnp.asarray(rng.standard_normal((L, K, 2 * I)), jnp.float8_e4m3fn)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.bfloat16)
    li = 1
    wd = w8[li].astype(jnp.float32) * np.asarray(scale)[None, :]
    xf = x.astype(jnp.float32)
    ref = jax.nn.silu(xf @ wd[:, :I]) * (xf @ wd[:, I:])
    got = stacked_quantized_matmul_gated(x, w8, scale, jnp.int32(li),
                                         act="silu", interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=5e-2, atol=5e-2)


def test_unsupported_dims_fall_back():
    # I with no 128-aligned divisor <= 1024 (prime * 128 + 64)
    assert not stacked_matmul_gated_supported(256, 2 * 1000, "silu")
    assert not stacked_matmul_gated_supported(256, 1024, "swish9")
