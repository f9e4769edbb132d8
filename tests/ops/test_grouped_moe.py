"""Grouped MoE matmul (ops/grouped_matmul.py) vs the masked-dense
formulation in layers/moe.py — all three paths must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_vllm_tpu.layers.moe import FusedMoE, topk_softmax
from light_vllm_tpu.ops.grouped_matmul import (grouped_matmul,
                                               moe_sorted_compute)


def test_grouped_matmul_reference_matches_loop():
    rng = np.random.default_rng(0)
    m, K, N, G = 64, 32, 48, 4
    sizes = np.array([10, 0, 30, 24], dtype=np.int32)
    lhs = rng.standard_normal((m, K)).astype(np.float32)
    rhs = rng.standard_normal((G, K, N)).astype(np.float32)
    out = np.asarray(grouped_matmul(jnp.asarray(lhs), jnp.asarray(rhs),
                                    jnp.asarray(sizes)))
    row = 0
    for g, s in enumerate(sizes):
        want = lhs[row:row + s] @ rhs[g]
        np.testing.assert_allclose(out[row:row + s], want, rtol=1e-5,
                                   atol=1e-5)
        row += s


@pytest.mark.parametrize("T,k", [(16, 2), (128, 2)])
def test_moe_sorted_matches_masked_dense(T, k):
    rng = np.random.default_rng(1)
    E, H, inter = 4, 32, 64
    moe = FusedMoE(num_experts=E, top_k=k, hidden_size=H,
                   intermediate_size=inter, dtype=jnp.float32)
    params = {
        "router": jnp.asarray(rng.standard_normal((H, E)) * 0.5,
                              jnp.float32),
        "w13": jnp.asarray(rng.standard_normal((E, H, 2 * inter)) * 0.1,
                           jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((E, inter, H)) * 0.1,
                          jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)

    dense = moe(params, x)  # CPU → masked-dense

    logits = jnp.dot(x, params["router"],
                     preferred_element_type=jnp.float32)
    weights, ids = topk_softmax(logits, k)
    grouped = moe_sorted_compute(x, params["w13"], params["w2"],
                                 weights, ids, top_k=k, use_pallas=False)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(grouped),
                               rtol=2e-4, atol=2e-4)


def test_moe_pallas_gmm_interpret_matches_reference():
    rng = np.random.default_rng(2)
    E, H, inter, T, k = 4, 128, 128, 64, 2
    w13 = jnp.asarray(rng.standard_normal((E, H, 2 * inter)) * 0.1,
                      jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, inter, H)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    weights, ids = topk_softmax(logits, k)

    ref = moe_sorted_compute(x, w13, w2, weights, ids, top_k=k,
                             use_pallas=False)
    pal = moe_sorted_compute(x, w13, w2, weights, ids, top_k=k,
                             use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pal),
                               rtol=2e-4, atol=2e-4)
