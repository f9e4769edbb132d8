"""Pallas TPU paged-attention decode kernel.

TPU-native replacement for the reference's CUDA paged attention
(reference: csrc/attention/attention_kernels.cu paged_attention_v1/v2) and
flash_attn_with_kvcache (reference:
light_vllm/decoding/backends/attention/backends/flash_attn.py:559).

One query token per sequence (decode steady state). Layout:

    q        [S, h, d]
    kv_pages [P, page_size, 2*kvh, d]   (combined K|V cache, slots-major;
                                         page 0 = null)
    block_tables [S, max_pages] (scalar-prefetched)
    seq_lens [S]                  (scalar-prefetched)

Grid: (S / SEQ_BLOCK,). Each instance handles SEQ_BLOCK sequences at once:
their page DMAs are issued together so transfer latencies overlap (decode
attention is DMA-latency-bound at serving batch sizes — per-page copies are
KBs), then each sequence's online-softmax block runs on the buffered pages.
GQA groups are static loops over kv heads.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_vllm_tpu.utils import cdiv

NEG_INF = -1e30

SEQ_BLOCK = 16  # sequences per kernel instance


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [S, max_pages] SMEM
    seq_lens_ref,      # [S] SMEM
    layer_ref,         # [1] SMEM — layer slice of the stacked cache
    # inputs
    q_ref,             # [B, kvh, G_pad, d] VMEM
    kv_pages_hbm,      # [L, P, page_size, 2*kvh, d] ANY
    # outputs
    out_ref,           # [B, kvh, G_pad, d] VMEM
    # scratch
    kv_buf,            # [2, B, ppf, page_size, 2*kvh, d] VMEM
    acc_ref,           # [B, kvh, G_pad, d] f32
    m_ref, l_ref,      # [B, kvh, G_pad, 128] f32
    sems,              # DMA semaphores [2, B, ppf]
    *,
    page_size: int,
    pages_per_fetch: int,
    scale: float,
    kvh: int,
    seq_block: int,
    sliding_window=None,
    soft_cap=None,
    packed: bool = False,
):
    inst = pl.program_id(0)
    B = seq_block
    G, d = q_ref.shape[2], q_ref.shape[3]
    R = pages_per_fetch * page_size

    def seq_len_of(b):
        return seq_lens_ref[inst * B + b]

    def num_pages_of(b):
        return (seq_len_of(b) + page_size - 1) // page_size

    def win_start_of(b):
        """First kv position the (single, last-token) query may attend."""
        if sliding_window is None:
            return jnp.int32(0)
        return jnp.maximum(seq_len_of(b) - sliding_window, 0)

    def start_page_of(b):
        return win_start_of(b) // page_size

    # max fetches across the block drives the shared loop; out-of-window
    # pages are never fetched (their physical blocks were rotated anyway).
    max_span = num_pages_of(0) - start_page_of(0)
    for b in range(1, B):
        max_span = jnp.maximum(max_span,
                               num_pages_of(b) - start_page_of(b))
    num_fetches = (max_span + pages_per_fetch - 1) // pages_per_fetch

    def dma(b, fetch_idx, slot, p):
        page_idx = start_page_of(b) + fetch_idx * pages_per_fetch + p
        page_id = block_tables_ref[inst * B + b, jnp.minimum(
            page_idx, block_tables_ref.shape[1] - 1)]
        return (pltpu.make_async_copy(
            kv_pages_hbm.at[layer_ref[0], page_id],
            kv_buf.at[slot, b, p],
            sems.at[slot, b, p]), page_idx)

    def start_fetch(fetch_idx, slot):
        for b in range(B):
            for p in range(pages_per_fetch):
                c, page_idx = dma(b, fetch_idx, slot, p)

                @pl.when(page_idx < num_pages_of(b))
                def _():
                    c.start()

    def wait_fetch(fetch_idx, slot):
        for b in range(B):
            for p in range(pages_per_fetch):
                c, page_idx = dma(b, fetch_idx, slot, p)

                @pl.when(page_idx < num_pages_of(b))
                def _():
                    c.wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(num_fetches > 0)
    def _():
        start_fetch(0, 0)

    def body(fetch_idx, _):
        slot = fetch_idx % 2
        next_slot = (fetch_idx + 1) % 2

        @pl.when(fetch_idx + 1 < num_fetches)
        def _():
            start_fetch(fetch_idx + 1, next_slot)

        wait_fetch(fetch_idx, slot)

        for b in range(B):
            seq_len = seq_len_of(b)
            base = (start_page_of(b) + fetch_idx * pages_per_fetch) \
                * page_size

            @pl.when(base < seq_len)
            def _():
                pos = base + jax.lax.broadcasted_iota(
                    jnp.int32, (R, 1), 0)
                row_valid = pos < seq_len
                if sliding_window is not None:
                    row_valid &= pos >= win_start_of(b)
                kv = kv_buf[slot, b].reshape(
                    R, kvh if packed else 2 * kvh, d)
                for j in range(kvh):
                    q = q_ref[b, j].astype(jnp.float32) * scale  # [G, d]
                    if packed:
                        # head_dim-64 lane packing: row j carries K_j in
                        # lanes 0:64 and V_j in lanes 64:128. q's V lanes
                        # are zero, so q·row == q·K_j; p·row puts p·V_j in
                        # lanes 64:128 (sliced out by the caller).
                        k = v = jnp.where(
                            row_valid, kv[:, j, :].astype(jnp.float32),
                            0.0)
                    else:
                        # interleaved layout: K_j at row 2j, V_j at 2j+1
                        k = kv[:, 2 * j, :].astype(jnp.float32)
                        v = jnp.where(
                            row_valid,
                            kv[:, 2 * j + 1, :].astype(jnp.float32), 0.0)
                    scores = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [G, R]
                    if soft_cap is not None:
                        scores = soft_cap * jnp.tanh(scores / soft_cap)
                    scores = jnp.where(row_valid.reshape(1, R), scores,
                                       NEG_INF)

                    m_prev = m_ref[b, j, :, :1]
                    m_cur = jnp.max(scores, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m_prev, m_cur)
                    alpha = jnp.exp(m_prev - m_new)
                    p = jnp.exp(scores - m_new)
                    l_ref[b, j, :, :1] = alpha * l_ref[b, j, :, :1] + \
                        jnp.sum(p, axis=-1, keepdims=True)
                    acc_ref[b, j] = acc_ref[b, j] * alpha + \
                        jax.lax.dot_general(
                            p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    m_ref[b, j, :, :1] = m_new
        return 0

    jax.lax.fori_loop(0, num_fetches, body, 0)

    l = jnp.maximum(l_ref[:, :, :, :1], 1e-30)
    out_ref[:] = (acc_ref[:] / l).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "scale", "pages_per_fetch",
                     "sliding_window", "soft_cap", "interpret"))
def paged_attention_decode(
    q: jnp.ndarray,            # [S, h, d]
    kv_pages: jnp.ndarray,     # [num_slots, 2*kvh, d] cache, or stacked
                               # [L, num_slots, 2*kvh, d] with layer_idx
    block_tables: jnp.ndarray,  # [S, max_pages] i32
    seq_lens: jnp.ndarray,     # [S] i32
    *,
    page_size: int,
    scale: float,
    pages_per_fetch: int = 8,
    sliding_window=None,
    soft_cap=None,
    layer_idx=None,            # scalar i32 selecting the stacked layer
    interpret: bool = False,
) -> jnp.ndarray:
    """The stacked form exists so the scan-over-layers step can hand the
    kernel the WHOLE cache: slicing one layer out before a pallas_call
    materializes a full per-layer copy every scan iteration (custom calls
    need real buffers, not dynamic-slice views)."""
    S, h, d = q.shape
    if layer_idx is None:
        kv_pages = kv_pages[None]
        layer_idx = jnp.zeros((), jnp.int32)
    L, num_slots, kvh2, _ = kv_pages.shape
    kvh = kvh2 // 2
    G = h // kvh
    B = min(SEQ_BLOCK, S)
    # head_dim 64 (Qwen2-0.5B class): Mosaic can't tile 64-lane arrays, so
    # reinterpret the per-head-interleaved cache [.., 2*kvh, 64] as
    # [.., kvh, 128] (pure reshape: K_j | V_j share a 128-lane row) and
    # zero-pad q's V lanes — see the packed branch in _decode_kernel.
    packed = d == 64
    # Pad the GQA group up to the sublane tile so q blocks are tileable;
    # padded rows cost nothing (decode attention is DMA-bound).
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    G_pad = max(cdiv(G, sublane) * sublane, sublane)
    q_grouped = q.reshape(S, kvh, G, d)
    if G_pad != G:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, G_pad - G),
                                        (0, 0)))
    if packed:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, 0), (0, 64)))
        d_k = 128
        kv = kv_pages.reshape(L, num_slots // page_size, page_size, kvh,
                              128)
        kv_rows = kvh
    else:
        d_k = d
        kv = kv_pages.reshape(L, num_slots // page_size, page_size,
                              2 * kvh, d)
        kv_rows = 2 * kvh
    layer_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cdiv(S, B),),
        in_specs=[
            pl.BlockSpec((B, kvh, G_pad, d_k), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # kv pages stay in HBM
        ],
        out_specs=pl.BlockSpec((B, kvh, G_pad, d_k),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, B, pages_per_fetch, page_size, kv_rows, d_k),
                       kv_pages.dtype),
            pltpu.VMEM((B, kvh, G_pad, d_k), jnp.float32),
            pltpu.VMEM((B, kvh, G_pad, 128), jnp.float32),
            pltpu.VMEM((B, kvh, G_pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, B, pages_per_fetch)),
        ],
    )

    kernel = pl.pallas_call(
        functools.partial(_decode_kernel, page_size=page_size,
                          pages_per_fetch=pages_per_fetch, scale=scale,
                          kvh=kvh, seq_block=B,
                          sliding_window=sliding_window,
                          soft_cap=soft_cap, packed=packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, kvh, G_pad, d_k), q.dtype),
        interpret=interpret,
    )
    out = kernel(block_tables, seq_lens, layer_arr, q_grouped, kv)
    if packed:
        return out[:, :, :G, 64:].reshape(S, h, d)
    return out[:, :, :G, :].reshape(S, h, d)
