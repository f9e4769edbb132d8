"""Reference (pure-jnp) attention implementations.

These are the correctness baseline for the Pallas kernels and the CPU
fallback path — the role the reference's TORCH_NAIVE/TORCH_SDPA backends play
(reference: light_vllm/prefill_only/backends/attention/backends/torch_naive.py).
They are O(dense) and meant for tests and small batches, not production.
"""

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def dense_attention(
    q: jnp.ndarray,          # [B, L, h, d]
    k: jnp.ndarray,          # [B, L, kvh, d]
    v: jnp.ndarray,          # [B, L, kvh, d]
    mask: jnp.ndarray,       # [B, L] bool — True for real tokens
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    logits_soft_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Batched dense attention for encoder / prefill-only workflows."""
    B, L, h, d = q.shape
    kvh = k.shape[2]
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = scale if scale is not None else d ** -0.5
    scores = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if logits_soft_cap:
        scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)
    m = mask[:, None, None, :]  # [B,1,1,M]
    if causal:
        causal_m = jnp.tril(jnp.ones((L, L), bool))[None, None]
        m = m & causal_m
    if sliding_window is not None:
        i = jnp.arange(L)[:, None]
        m = m & (jnp.arange(L)[None, :] > i - sliding_window)[None, None]
    scores = jnp.where(m, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def ragged_paged_attention_ref(
    q: jnp.ndarray,             # [T, h, d] flattened mixed batch
    kv_pages: jnp.ndarray,      # [num_slots, 2*kvh, d] combined cache
    block_tables: jnp.ndarray,  # [S, max_pages] int32
    seq_lens: jnp.ndarray,      # [S] total kv len incl. this step's tokens
    seq_ids: jnp.ndarray,       # [T] seq slot of each token (pad → slot with
                                #     seq_len 0)
    positions: jnp.ndarray,     # [T] absolute position of each token
    page_size: int,
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    layer_idx=None,   # scalar; kv_pages stacked [L, num_slots, 2*kvh, d]
) -> jnp.ndarray:
    """Paged attention over a ragged token batch (prefills + decodes mixed).

    Functional contract of the Pallas ragged kernels and of the reference's
    flash_attn backend (reference:
    light_vllm/decoding/backends/attention/backends/flash_attn.py:443-571):
    the query token at absolute position p of sequence s attends to that
    sequence's KV slots [max(0, p-window+1) .. p]. Tokens may sit anywhere in
    the flat array (padding gaps allowed); seq_ids/positions carry the
    mapping.
    """
    T, h, d = q.shape
    if layer_idx is not None:
        # Correctness baseline only: the slice copy is fine on CPU.
        kv_pages = jax.lax.dynamic_index_in_dim(kv_pages, layer_idx, 0,
                                                keepdims=False)
    kvh = kv_pages.shape[1] // 2
    S, max_pages = block_tables.shape
    max_kv = max_pages * page_size
    scale = scale if scale is not None else d ** -0.5

    # Gather per-token KV context [T, max_kv, h, d] — O(T·max_kv), fine for
    # a correctness baseline.
    slot_ids = (block_tables[:, :, None] * page_size
                + jnp.arange(page_size)[None, None, :]).reshape(S, max_kv)
    tok_slots = slot_ids[seq_ids]  # [T, max_kv]
    kv_tok = kv_pages[tok_slots]   # [T, max_kv, 2*kvh, d] (K/V interleaved)
    k_tok = kv_tok[:, :, 0::2, :]
    v_tok = kv_tok[:, :, 1::2, :]
    if kvh != h:
        rep = h // kvh
        k_tok = jnp.repeat(k_tok, rep, axis=2)
        v_tok = jnp.repeat(v_tok, rep, axis=2)

    scores = jnp.einsum("thd,tkhd->thk", q.astype(jnp.float32),
                        k_tok.astype(jnp.float32)) * scale
    if logits_soft_cap:
        scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)

    kv_j = jnp.arange(max_kv)[None, :]             # [1, max_kv]
    valid = kv_j <= positions[:, None]
    valid &= kv_j < seq_lens[seq_ids][:, None]
    if sliding_window is not None:
        valid &= kv_j > (positions[:, None] - sliding_window)
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum("thk,tkhd->thd", probs, v_tok.astype(jnp.float32))
    return out.astype(q.dtype)
