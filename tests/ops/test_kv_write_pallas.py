"""In-place Pallas KV-cache writer (ops/kv_write_pallas.py): kernel parity
vs the jnp scatter, and builder write-plan correctness on mixed batches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from light_vllm_tpu.ops.kv_cache import write_kv_to_pages
from light_vllm_tpu.ops.kv_write_pallas import write_kv_pages_inplace


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _plan_from_slots(slot_mapping, bs):
    """Reference run-encoder: greedy page runs + singles (test-only)."""
    T = len(slot_mapping)
    pages, rows = [], []
    i = 0
    while i < T:
        s = slot_mapping[i]
        if (s % bs == 0 and i + bs <= T
                and all(slot_mapping[i + j] == s + j for j in range(bs))):
            pages.append((s, i))
            i += bs
        else:
            rows.append((s, i))
            i += 1
    return pages, rows


def _tables(pages, rows, NP, NR):
    wp = np.zeros((2, NP), np.int32)
    wr = np.zeros((2, NR), np.int32)
    for j, (d, s) in enumerate(pages):
        wp[:, j] = (d, s)
    for j, (d, s) in enumerate(rows):
        wr[:, j] = (d, s)
    return (jnp.asarray([len(pages), len(rows)], jnp.int32),
            jnp.asarray(wp), jnp.asarray(wr))


@pytest.mark.parametrize("stacked", [False, True])
def test_kernel_matches_scatter(rng, stacked):
    L, slots, kvh, d, bs = 3, 25 * 8, 2, 128, 8
    T = 40
    k = jnp.asarray(rng.standard_normal((T, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, kvh, d)), jnp.float32)
    # mix of aligned pages and scattered singles, incl. a partial tail
    slot_mapping = np.concatenate([
        np.arange(16, 16 + 2 * bs),          # two aligned pages
        np.array([7, 90, 41, 33]),           # singles
        np.arange(48, 48 + bs),              # aligned page
        np.arange(120, 120 + T - (2 * bs + 4 + bs)),  # partial page
    ]).astype(np.int32)
    shape = (L, slots, 2 * kvh, d) if stacked else (slots, 2 * kvh, d)
    li = jnp.int32(1) if stacked else None
    base = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    want = write_kv_to_pages(base, k, v, jnp.asarray(slot_mapping),
                             layer_idx=li)
    pages, rows = _plan_from_slots(slot_mapping, bs)
    assert pages and rows  # the layout above must exercise both paths
    counts, wp, wr = _tables(pages, rows, len(pages), len(rows) + 3)
    kv = jnp.stack([k, v], axis=2).reshape(T, 2 * kvh, d)
    got = write_kv_pages_inplace(base, kv, counts, wp, wr, li,
                                 page_size=bs, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_builder_write_plan_covers_batch(rng):
    """The builder's write plan must write exactly the real tokens' slots
    (pads excluded), matching the scatter's effect outside the trash page."""
    from light_vllm_tpu.decoding.processor import DecodingModelInputBuilder
    from light_vllm_tpu.decoding.sampling_params import SamplingParams
    from light_vllm_tpu.decoding.schema import (DecodingSchedulerOutput,
                                                SequenceData,
                                                SequenceGroupMetadata)

    bs = 8
    builder = DecodingModelInputBuilder(
        block_size=bs, max_model_len=128, max_num_seqs=4, vocab_size=100,
        max_num_batched_tokens=256, enable_chunked_prefill=True,
        static_shapes=False)

    # one decode seq + one chunked prefill continuation (ctx=5 → unaligned
    # head) + one fresh prompt (aligned, partial tail)
    d0 = SequenceData([3, 1, 4, 1, 5])
    d0._num_computed_tokens = 5
    d0.output_token_ids = [7]
    m0 = SequenceGroupMetadata(
        request_id="dec", is_prompt=False, seq_data={0: d0},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={0: [2]}, token_chunk_size=1)
    d1 = SequenceData(list(range(21)))
    d1._num_computed_tokens = 5
    m1 = SequenceGroupMetadata(
        request_id="chunk", is_prompt=True, seq_data={1: d1},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={1: [4, 5, 6]}, token_chunk_size=16)
    d2 = SequenceData(list(range(11)))
    m2 = SequenceGroupMetadata(
        request_id="fresh", is_prompt=True, seq_data={2: d2},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={2: [8, 9]}, token_chunk_size=11)
    out = DecodingSchedulerOutput(seq_group_metadata_list=[m0, m1, m2])
    mi = builder(out).model_input

    # unpack the blob pieces we need
    T, S, NT, P = mi.T, mi.S, mi.NT, mi.P
    blob = mi.blob
    tok = blob[:4 * T].reshape(4, T)
    slot_arr = tok[2]
    off = 4 * T + 8 * S + 6 * S + 2 * NT + S * P + S * mi.max_out
    counts = blob[off:off + 2]
    off += 2
    NP = max(T // bs, 1)
    wp = blob[off:off + 2 * NP].reshape(2, NP)
    off += 2 * NP
    wr = blob[off:off + 2 * T].reshape(2, T)

    # apply both paths to an empty cache of ones-valued kv rows
    slots = 16 * bs
    kv = np.zeros((T, 2, 4), np.float32)
    kv[:, :, :] = np.arange(T, dtype=np.float32)[:, None, None] + 1.0
    cache_scatter = np.zeros((slots, 2, 4), np.float32)
    # scatter semantics, pads masked out (pads carry slot 0)
    for i in range(T):
        s = int(slot_arr[i])
        if i < mi.decode_region and i >= mi.num_decode_tokens:
            continue  # decode padding
        if s == 0 and i != 0 and int(tok[3][i]) == S - 1:
            continue  # prefill padding rows
        cache_scatter[s] = kv[i]
    cache_kernel = np.zeros((slots, 2, 4), np.float32)
    for j in range(int(counts[0])):
        dst, src = int(wp[0, j]), int(wp[1, j])
        cache_kernel[dst:dst + bs] = kv[src:src + bs]
    for j in range(int(counts[1])):
        dst, src = int(wr[0, j]), int(wr[1, j])
        cache_kernel[dst] = kv[src]
    np.testing.assert_array_equal(cache_kernel, cache_scatter)
    assert int(counts[0]) >= 2  # aligned pages found
    assert int(counts[1]) >= 1 + 5  # decode single + unaligned head
