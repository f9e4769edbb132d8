"""Stacked-weight Pallas matmul: parity vs x @ w_stack[l] (interpret mode).

The kernel backs StackedKernelRef under scan-over-layers
(models/scan_utils.py) — weight tiles are read straight from the [L, K, N]
stack with the layer index scalar-prefetched, so XLA never sees (or
rematerializes) a per-layer slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_vllm_tpu.ops.stacked_matmul_pallas import (
    stacked_matmul, stacked_matmul_supported)


@pytest.mark.parametrize("M,K,N", [
    (128, 256, 512),     # decode-shaped
    (100, 512, 256),     # M not a multiple of the tile
    (1024, 256, 1024),   # prefill-shaped, multi m-tile
    (8, 2048, 256),      # tiny batch, K at the tile cap
])
def test_parity(M, K, N):
    L = 3
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (M, K), jnp.float32)
    w = jax.random.normal(kw, (L, K, N), jnp.float32) * 0.05
    for l in range(L):
        got = stacked_matmul(x, w, jnp.int32(l), interpret=True)
        ref = x @ w[l]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_bf16_parity():
    M, K, N, L = 64, 512, 768, 2
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (L, K, N), jnp.bfloat16) * 0.05
    got = stacked_matmul(x, w, jnp.int32(1), interpret=True)
    ref = jnp.dot(x, w[1], preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    assert got.dtype == jnp.bfloat16


def test_fp8_stacked_parity():
    from light_vllm_tpu.ops.stacked_matmul_pallas import \
        stacked_quantized_matmul

    M, K, N, L = 64, 512, 768, 2
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    wf = np.asarray(jax.random.normal(kw, (L, K, N), jnp.float32)) * 0.05
    amax = np.abs(wf[1]).max(axis=0)
    scale = np.maximum(amax / 448.0, 1e-12).astype(np.float32)
    wq = jnp.asarray(np.clip(wf / scale[None, None, :], -448, 448),
                     jnp.float8_e4m3fn)
    got = stacked_quantized_matmul(x, wq, jnp.asarray(scale), jnp.int32(1),
                                   interpret=True)
    ref = jnp.dot(x, (wq[1].astype(jnp.bfloat16)),
                  preferred_element_type=jnp.float32) * scale
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_supported_predicate():
    assert stacked_matmul_supported(1536, 2048)
    assert stacked_matmul_supported(8960, 17920)
    assert not stacked_matmul_supported(100, 512)   # K not tileable
    assert not stacked_matmul_supported(512, 130)   # N not tileable
