"""Dense flash-attention kernel vs the jnp baseline (VERDICT r1 #9 —
encoder fast path; reference: prefill_only/backends/attention/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from light_vllm_tpu.ops.attention_ref import dense_attention
from light_vllm_tpu.ops.flash_attention import flash_attention_dense


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("B,L,h,kvh,d", [
    (2, 100, 4, 4, 64),     # BERT-class (head_dim 64, ragged lengths)
    (1, 300, 4, 2, 128),    # GQA + multi-tile L
    (1, 2100, 2, 2, 64),    # long input → adaptive 256/1024 tiles
])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_dense(B, L, h, kvh, d, causal, rng):
    q = jnp.asarray(rng.normal(size=(B, L, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, kvh, d)), jnp.float32)
    lens = rng.integers(L // 2, L + 1, size=B)
    mask = jnp.asarray(np.arange(L)[None, :] < lens[:, None])
    out = flash_attention_dense(q, k, v, mask, causal=causal,
                                interpret=True)
    ref = dense_attention(q, k, v, mask, causal=causal)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-3, err


def test_flash_all_masked_row_is_zero(rng):
    """causal row 0 of a left-padded batch has no visible column: the jnp
    baseline's NaN→0 convention must be preserved."""
    B, L, h, d = 1, 130, 2, 64
    q = jnp.asarray(rng.normal(size=(B, L, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, h, d)), jnp.float32)
    mask = jnp.asarray(np.arange(L)[None, :] >= 5)  # first 5 cols padded
    out = flash_attention_dense(q, k, v, mask, causal=True,
                                interpret=True)
    ref = dense_attention(q, k, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(out[0, :5]), 0.0)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-3, err
