"""Pallas decode kernel vs jnp reference (interpret mode on CPU) — the
attention-backend correctness-matrix pattern (reference:
tests/prefill_only/attention/test_basic_correctness.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from light_vllm_tpu.ops.attention_ref import ragged_paged_attention_ref
from light_vllm_tpu.ops.paged_attention_pallas import paged_attention_decode


@pytest.mark.parametrize("h,kvh,d", [(4, 4, 64), (8, 2, 128), (4, 1, 128)])
@pytest.mark.parametrize("page_size", [16, 32])
def test_decode_kernel_matches_reference(h, kvh, d, page_size, rng):
    S = 4
    max_pages = 8
    num_blocks = 64
    seq_lens = np.array([1, 17, 60, 128], dtype=np.int32)

    q = rng.standard_normal((S, h, d), dtype=np.float32)
    kv_pages = rng.standard_normal((num_blocks * page_size, 2 * kvh, d),
                                   dtype=np.float32)
    # distinct random block tables (blocks 1..)
    block_tables = np.zeros((S, max_pages), dtype=np.int32)
    used = set([0])
    for s in range(S):
        n = -(-int(seq_lens[s]) // page_size)
        for i in range(n):
            b = int(rng.integers(1, num_blocks))
            while b in used:
                b = int(rng.integers(1, num_blocks))
            used.add(b)
            block_tables[s, i] = b

    scale = d ** -0.5
    # decode: one query per seq at position seq_len-1
    seq_ids = np.arange(S, dtype=np.int32)
    positions = seq_lens - 1

    ref = ragged_paged_attention_ref(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.asarray(seq_ids), jnp.asarray(positions),
        page_size, scale=scale)

    out = paged_attention_decode(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        page_size=page_size, scale=scale, pages_per_fetch=2, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_decode_kernel_fp8_cache(rng):
    """fp8 KV pages (cache dtype != q dtype): the kernel upcasts operands
    to bf16 for the dots — the path the Llama-3-8B fp8 bench runs."""
    S, h, kvh, d, page_size = 4, 8, 2, 128, 16
    num_blocks, max_pages = 32, 8
    seq_lens = np.array([5, 30, 64, 100], dtype=np.int32)
    q = (rng.standard_normal((S, h, d), dtype=np.float32)
         ).astype(jnp.bfloat16)
    kvf = rng.standard_normal((num_blocks * page_size, 2 * kvh, d),
                              dtype=np.float32) * 0.25
    kv8 = jnp.asarray(kvf, jnp.float8_e4m3fn)
    block_tables = np.zeros((S, max_pages), dtype=np.int32)
    nxt = 1
    for s in range(S):
        for i in range(-(-int(seq_lens[s]) // page_size)):
            block_tables[s, i] = nxt
            nxt += 1
    scale = d ** -0.5
    ref = ragged_paged_attention_ref(
        q.astype(jnp.float32), kv8.astype(jnp.float32),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.arange(S, dtype=jnp.int32), jnp.asarray(seq_lens - 1),
        page_size, scale=scale)
    out = paged_attention_decode(
        q, kv8, jnp.asarray(block_tables), jnp.asarray(seq_lens),
        page_size=page_size, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("h,kvh,d", [(4, 2, 64)])
def test_prefill_kernel_matches_reference(h, kvh, d, rng):
    from light_vllm_tpu.ops.prefill_attention_pallas import (
        TILE_Q, prefill_paged_attention)

    page_size = 16
    num_blocks = 64
    # Two prefill seqs: one fresh (ctx 0, 140 new), one chunked continuation
    # (ctx 37, 100 new). Chunks 128-aligned in the flat array.
    specs = [(0, 140), (37, 100)]
    S = 4  # seq slots (2 used)
    max_pages = 16
    chunk_starts, tiles = [], []
    cursor = 0
    for s, (ctx, qn) in enumerate(specs):
        chunk_starts.append(cursor)
        for t in range(-(-qn // TILE_Q)):
            tiles.append((s, cursor + t * TILE_Q))
        cursor += -(-qn // TILE_Q) * TILE_Q
    T = cursor

    q = rng.standard_normal((T, h, d), dtype=np.float32)
    kv_pages = rng.standard_normal((num_blocks * page_size, 2 * kvh, d),
                                   dtype=np.float32)
    block_tables = np.zeros((S, max_pages), dtype=np.int32)
    seq_lens = np.zeros(S, dtype=np.int32)
    ctx_lens = np.zeros(S, dtype=np.int32)
    cs_arr = np.zeros(S, dtype=np.int32)
    seq_ids = np.full(T, S - 1, dtype=np.int32)
    positions = np.zeros(T, dtype=np.int32)
    next_block = 1
    for s, (ctx, qn) in enumerate(specs):
        seq_lens[s] = ctx + qn
        ctx_lens[s] = ctx
        cs_arr[s] = chunk_starts[s]
        n = -(-int(seq_lens[s]) // page_size)
        block_tables[s, :n] = np.arange(next_block, next_block + n)
        next_block += n
        for i in range(qn):
            seq_ids[chunk_starts[s] + i] = s
            positions[chunk_starts[s] + i] = ctx + i

    NT = 4
    tile_seq = np.full(NT, -1, dtype=np.int32)
    tile_qstart = np.zeros(NT, dtype=np.int32)
    for i, (s, qs) in enumerate(tiles):
        tile_seq[i], tile_qstart[i] = s, qs

    scale = d ** -0.5
    ref = ragged_paged_attention_ref(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.asarray(seq_ids), jnp.asarray(positions), page_size, scale=scale)
    out = prefill_paged_attention(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(tile_seq), jnp.asarray(tile_qstart),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.asarray(ctx_lens), jnp.asarray(cs_arr),
        page_size=page_size, scale=scale, pages_per_fetch=2, interpret=True)

    # compare only real token rows
    mask = seq_ids < S - 1
    np.testing.assert_allclose(np.asarray(out)[mask], np.asarray(ref)[mask],
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window,cap", [(32, None), (None, 20.0),
                                        (32, 20.0)])
def test_decode_kernel_sliding_window_soft_cap(window, cap, rng):
    h, kvh, d, page_size = 4, 2, 128, 16
    S, max_pages, num_blocks = 4, 16, 96
    seq_lens = np.array([1, 17, 60, 200], dtype=np.int32)

    q = rng.standard_normal((S, h, d), dtype=np.float32)
    kv_pages = rng.standard_normal((num_blocks * page_size, 2 * kvh, d),
                                   dtype=np.float32)
    block_tables = np.zeros((S, max_pages), dtype=np.int32)
    nb = 1
    for s in range(S):
        n = -(-int(seq_lens[s]) // page_size)
        block_tables[s, :n] = np.arange(nb, nb + n)
        nb += n

    scale = d ** -0.5
    seq_ids = np.arange(S, dtype=np.int32)
    positions = seq_lens - 1
    ref = ragged_paged_attention_ref(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.asarray(seq_ids), jnp.asarray(positions),
        page_size, scale=scale, sliding_window=window,
        logits_soft_cap=cap)
    out = paged_attention_decode(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        page_size=page_size, scale=scale, pages_per_fetch=2,
        sliding_window=window, soft_cap=cap, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window,cap", [(48, None), (None, 30.0)])
def test_prefill_kernel_sliding_window_soft_cap(window, cap, rng):
    from light_vllm_tpu.ops.prefill_attention_pallas import (
        TILE_Q, prefill_paged_attention)

    h, kvh, d, page_size = 4, 2, 128, 16
    num_blocks = 96
    specs = [(0, 140), (97, 100)]  # fresh + chunked continuation
    S, max_pages = 4, 16
    chunk_starts, tiles = [], []
    cursor = 0
    for s, (ctx, qn) in enumerate(specs):
        chunk_starts.append(cursor)
        for t in range(-(-qn // TILE_Q)):
            tiles.append((s, cursor + t * TILE_Q))
        cursor += -(-qn // TILE_Q) * TILE_Q
    T = cursor

    q = rng.standard_normal((T, h, d), dtype=np.float32)
    kv_pages = rng.standard_normal((num_blocks * page_size, 2 * kvh, d),
                                   dtype=np.float32)
    block_tables = np.zeros((S, max_pages), dtype=np.int32)
    seq_lens = np.zeros(S, dtype=np.int32)
    ctx_lens = np.zeros(S, dtype=np.int32)
    cs_arr = np.zeros(S, dtype=np.int32)
    seq_ids = np.full(T, S - 1, dtype=np.int32)
    positions = np.zeros(T, dtype=np.int32)
    nb = 1
    for s, (ctx, qn) in enumerate(specs):
        seq_lens[s] = ctx + qn
        ctx_lens[s] = ctx
        cs_arr[s] = chunk_starts[s]
        n = -(-int(seq_lens[s]) // page_size)
        block_tables[s, :n] = np.arange(nb, nb + n)
        nb += n
        for i in range(qn):
            seq_ids[chunk_starts[s] + i] = s
            positions[chunk_starts[s] + i] = ctx + i

    NT = 4
    tile_seq = np.full(NT, -1, dtype=np.int32)
    tile_qstart = np.zeros(NT, dtype=np.int32)
    for i, (s, qs) in enumerate(tiles):
        tile_seq[i], tile_qstart[i] = s, qs

    scale = d ** -0.5
    ref = ragged_paged_attention_ref(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.asarray(seq_ids), jnp.asarray(positions), page_size,
        scale=scale, sliding_window=window, logits_soft_cap=cap)
    out = prefill_paged_attention(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(tile_seq), jnp.asarray(tile_qstart),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.asarray(ctx_lens), jnp.asarray(cs_arr),
        page_size=page_size, scale=scale, pages_per_fetch=2,
        sliding_window=window, soft_cap=cap, interpret=True)
    mask = seq_ids < S - 1
    np.testing.assert_allclose(np.asarray(out)[mask],
                               np.asarray(ref)[mask],
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("layout", ["contig", "mixed"])
def test_decode_kernel_coalesced_contig_fetch(layout, rng):
    """The contiguous-run DMA fast path (one ppf-page copy per chunk)
    must agree with the per-page fallback and the jnp reference: seqs
    with ascending physical runs ride the coalesced branch, shuffled
    ones the per-page branch, in the SAME kernel launch."""
    h, kvh, d, page_size, ppf = 8, 2, 128, 16, 4
    S = 6
    max_pages = 12
    num_blocks = 128
    seq_lens = np.array([1, 40, 64, 100, 128, 190], dtype=np.int32)

    q = rng.standard_normal((S, h, d), dtype=np.float32)
    kv_pages = rng.standard_normal((num_blocks * page_size, 2 * kvh, d),
                                   dtype=np.float32)
    block_tables = np.zeros((S, max_pages), dtype=np.int32)
    nxt = 1
    for s in range(S):
        n = -(-int(seq_lens[s]) // page_size)
        ids = list(range(nxt, nxt + n))
        nxt += n
        if layout == "mixed" and s % 2:
            ids = ids[::-1]  # descending: never coalesced
        block_tables[s, :n] = ids

    scale = d ** -0.5
    ref = ragged_paged_attention_ref(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.asarray(np.arange(S, dtype=np.int32)),
        jnp.asarray(seq_lens - 1), page_size, scale=scale)

    out = paged_attention_decode(
        jnp.asarray(q), jnp.asarray(kv_pages),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        page_size=page_size, scale=scale, pages_per_fetch=ppf,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
