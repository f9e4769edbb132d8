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
    scores = jnp.where(m, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def ragged_paged_attention_ref(
    q: jnp.ndarray,             # [T, h, d] flattened mixed batch
    k_pages: jnp.ndarray,       # [kvh, num_slots, d]
    v_pages: jnp.ndarray,       # [kvh, num_slots, d]
    block_tables: jnp.ndarray,  # [S, max_pages] int32
    seq_lens: jnp.ndarray,      # [S] total kv len incl. this step's tokens
    query_start_loc: jnp.ndarray,  # [S+1] cumulative query offsets
    page_size: int,
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
) -> jnp.ndarray:
    """Paged attention over a ragged token batch (prefills + decodes mixed).

    Functional contract of the Pallas ragged kernel and of the reference's
    flash_attn backend (reference:
    light_vllm/decoding/backends/attention/backends/flash_attn.py:443-571):
    each query token at absolute position p of sequence s attends to that
    sequence's KV slots [max(0, p-window+1) .. p].
    """
    T, h, d = q.shape
    kvh = k_pages.shape[0]
    S, max_pages = block_tables.shape
    max_kv = max_pages * page_size
    scale = scale if scale is not None else d ** -0.5

    query_lens = query_start_loc[1:] - query_start_loc[:-1]  # [S]
    max_q = T  # upper bound; fine for a reference impl

    # Dense per-seq query tensor [S, max_q, h, d] via scatter.
    token_idx = jnp.arange(T)
    seq_of_token = jnp.searchsorted(query_start_loc, token_idx,
                                    side="right") - 1  # [T]
    qpos_in_seq = token_idx - query_start_loc[seq_of_token]
    q_dense = jnp.zeros((S, max_q, h, d), q.dtype)
    q_dense = q_dense.at[seq_of_token, qpos_in_seq].set(q, mode="drop")

    # Gather per-seq KV [S, max_kv, kvh, d].
    slot_ids = (block_tables[:, :, None] * page_size
                + jnp.arange(page_size)[None, None, :]).reshape(S, max_kv)
    # k_pages[:, slot_ids, :] : [kvh, S, max_kv, d] → [S, max_kv, kvh, d]
    k_seq = jnp.transpose(k_pages[:, slot_ids, :], (1, 2, 0, 3))
    v_seq = jnp.transpose(v_pages[:, slot_ids, :], (1, 2, 0, 3))
    if kvh != h:
        rep = h // kvh
        k_seq = jnp.repeat(k_seq, rep, axis=2)
        v_seq = jnp.repeat(v_seq, rep, axis=2)

    scores = jnp.einsum("sqhd,skhd->shqk", q_dense.astype(jnp.float32),
                        k_seq.astype(jnp.float32)) * scale
    if logits_soft_cap:
        scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)

    # Mask: absolute position of dense q row (s, qi) is
    # seq_lens[s] - query_lens[s] + qi; valid kv j iff j <= p (< seq_len).
    qi = jnp.arange(max_q)[None, :]                     # [1, max_q]
    abs_pos = (seq_lens - query_lens)[:, None] + qi     # [S, max_q]
    kv_j = jnp.arange(max_kv)[None, None, :]            # [1, 1, max_kv]
    valid = kv_j <= abs_pos[:, :, None]
    valid &= kv_j < seq_lens[:, None, None]
    if sliding_window is not None:
        valid &= kv_j > (abs_pos[:, :, None] - sliding_window)
    scores = jnp.where(valid[:, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out_dense = jnp.einsum("shqk,skhd->sqhd", probs,
                           v_seq.astype(jnp.float32))
    out = out_dense[seq_of_token, qpos_in_seq]  # [T, h, d]
    return out.astype(q.dtype)
