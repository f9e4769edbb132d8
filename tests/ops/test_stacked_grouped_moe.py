"""Stacked-expert grouped matmul: the scan-over-layers MoE path indexes
[L, E, K, N] expert stacks in place (no per-layer slice). Parity vs the
lax.ragged_dot reference and end-to-end vs the masked-dense MoE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_vllm_tpu.ops.grouped_matmul import (GROUP_TILE_M,
                                               moe_sorted_compute,
                                               stacked_grouped_matmul,
                                               stacked_grouped_supported)


def test_supported_predicate():
    assert stacked_grouped_supported(4096, 28672)
    assert stacked_grouped_supported(256, 512)
    assert not stacked_grouped_supported(100, 512)


def test_kernel_parity_vs_ragged_dot():
    L, E, K, N = 2, 4, 256, 512
    mt = GROUP_TILE_M
    rng = np.random.default_rng(0)
    sizes = np.array([mt - 7, 0, 2 * mt, 5], np.int32)  # ragged + empty
    M = int(sizes.sum())
    lhs = rng.standard_normal((M, K)).astype(np.float32) * 0.1
    w = rng.standard_normal((L, E, K, N)).astype(np.float32) * 0.05

    # tile-aligned layout
    padded = -(-sizes // mt) * mt
    astart = np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(np.int32)
    gstart = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    M_pad = int(padded.sum())
    M_pad = -(-M_pad // mt) * mt
    lhs_al = np.zeros((M_pad, K), np.float32)
    dest = np.concatenate([astart[e] + np.arange(sizes[e])
                           for e in range(E)]).astype(np.int32)
    lhs_al[dest] = lhs
    tiles = np.arange(M_pad // mt) * mt
    tile_expert = np.clip(
        (tiles[:, None] >= astart[None, :]).sum(1) - 1, 0, E - 1
    ).astype(np.int32)

    for l in range(L):
        out_al = stacked_grouped_matmul(
            jnp.asarray(lhs_al), jnp.asarray(w),
            jnp.asarray(tile_expert), jnp.int32(l), interpret=True)
        got = np.asarray(out_al)[dest]
        ref = np.asarray(jax.lax.ragged_dot(
            jnp.asarray(lhs), jnp.asarray(w[l]), jnp.asarray(sizes)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_moe_sorted_compute_stacked_parity():
    """Full sorted-MoE path with stacked experts vs masked-dense math."""
    L, E, K, T, H, I = 2, 4, 2, 24, 256, 256
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32) * 0.1
    w13 = jnp.asarray(rng.standard_normal((L, E, H, 2 * I)),
                      jnp.float32) * 0.05
    w2 = jnp.asarray(rng.standard_normal((L, E, I, H)),
                     jnp.float32) * 0.05
    logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    from light_vllm_tpu.layers.activation import silu_and_mul
    from light_vllm_tpu.layers.moe import topk_softmax

    weights, ids = topk_softmax(logits, K, True)
    for l in range(L):
        got = moe_sorted_compute(x, w13, w2, weights, ids, top_k=K,
                                 layer_idx=jnp.int32(l), interpret=True)
        # dense reference
        combine = np.zeros((T, E), np.float32)
        np.add.at(combine, (np.arange(T)[:, None], np.asarray(ids)),
                  np.asarray(weights))
        h = np.einsum("th,ehi->eti", np.asarray(x), np.asarray(w13[l]))
        h = np.asarray(silu_and_mul(jnp.asarray(h)))
        y = np.einsum("eti,eih->eth", h, np.asarray(w2[l]))
        ref = np.einsum("te,eth->th", combine, y)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3,
                                   atol=2e-3)


def test_mixtral_scan_grouped_token_parity(monkeypatch):
    """Engine-level: tiny Mixtral under scan with the grouped backend
    forced — StackedKernelRef expert stacks (indexed=1) must match the
    sliced path token-for-token. Both variants run inside ONE test so the
    comparison cannot be split across pytest-xdist workers."""
    monkeypatch.setenv("LVT_SCAN_LAYERS", "1")
    monkeypatch.setenv("LVT_MOE_BACKEND", "grouped")
    from light_vllm_tpu import LLM, SamplingParams

    cfg = dict(architectures=["MixtralForCausalLM"], vocab_size=512,
               hidden_size=256, num_hidden_layers=2,
               num_attention_heads=2, num_key_value_heads=2,
               intermediate_size=256, num_local_experts=4,
               num_experts_per_tok=2, max_position_embeddings=128,
               rms_norm_eps=1e-5, rope_theta=10000.0, hidden_act="silu",
               tie_word_embeddings=False)

    def run(indexed):
        monkeypatch.setenv("LVT_INDEXED_PARAMS", indexed)
        llm = LLM(hf_config=cfg, load_format="dummy", dtype="float32",
                  max_model_len=64, block_size=16,
                  num_device_blocks_override=64, max_num_seqs=4, seed=0)
        outs = llm.generate([{"prompt_token_ids": [5, 6, 7, 8, 9]}],
                            SamplingParams(temperature=0.0, max_tokens=6,
                                           ignore_eos=True))
        toks = list(outs[0].outputs[0].token_ids)
        llm.llm_engine.shutdown()
        return toks

    assert run("1") == run("0")
