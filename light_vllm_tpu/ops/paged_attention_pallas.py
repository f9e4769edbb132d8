"""Pallas TPU paged-attention decode kernel.

TPU-native replacement for the reference's CUDA paged attention
(reference: csrc/attention/attention_kernels.cu paged_attention_v1/v2) and
flash_attn_with_kvcache (reference:
light_vllm/decoding/backends/attention/backends/flash_attn.py:559).

One query token per sequence (decode steady state). Layout:

    q        [S, h, d]
    k_pages  [kvh, P, page_size, d]   (paged KV, page 0 = null)
    v_pages  [kvh, P, page_size, d]
    block_tables [S, max_pages] (scalar-prefetched)
    seq_lens [S]                  (scalar-prefetched)

Grid: (S, kvh). Each instance computes the GQA group (G = h/kvh query heads)
of one sequence against that kv head's pages with an online-softmax
accumulator, double-buffering page DMAs from HBM so bandwidth stays saturated
(decode attention is bandwidth-bound; the MXU work per page is trivial).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_vllm_tpu.utils import cdiv

NEG_INF = -1e30


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [S, max_pages] SMEM
    seq_lens_ref,      # [S] SMEM
    # inputs
    q_ref,             # [1, 1, G, d] VMEM (this seq, this kv head's q group)
    k_pages_hbm,       # [kvh, P, page_size, d] HBM/ANY (full array)
    v_pages_hbm,       # [kvh, P, page_size, d] HBM/ANY
    # outputs
    out_ref,           # [1, 1, G, d] VMEM
    # scratch
    k_buf, v_buf,      # [2, pages_per_fetch, page_size, d] VMEM
    acc_ref,           # [G, d] f32
    m_ref, l_ref,      # [G, 128] f32 running max / sum
    sems,              # DMA semaphores [2, 2]
    *,
    page_size: int,
    pages_per_fetch: int,
    scale: float,
):
    s = pl.program_id(0)
    j = pl.program_id(1)  # kv head
    seq_len = seq_lens_ref[s]
    num_pages = (seq_len + page_size - 1) // page_size
    num_fetches = (num_pages + pages_per_fetch - 1) // pages_per_fetch
    G, d = q_ref.shape[2], q_ref.shape[3]
    fetch_rows = pages_per_fetch * page_size

    def dma(fetch_idx, slot, p):
        page_idx = fetch_idx * pages_per_fetch + p
        page_id = block_tables_ref[s, jnp.minimum(
            page_idx, block_tables_ref.shape[1] - 1)]
        return (
            pltpu.make_async_copy(k_pages_hbm.at[j, page_id],
                                  k_buf.at[slot, p], sems.at[slot, 0, p]),
            pltpu.make_async_copy(v_pages_hbm.at[j, page_id],
                                  v_buf.at[slot, p], sems.at[slot, 1, p]),
            page_idx,
        )

    def start_fetch(fetch_idx, slot):
        for p in range(pages_per_fetch):
            kd, vd, page_idx = dma(fetch_idx, slot, p)

            @pl.when(page_idx < num_pages)
            def _():
                kd.start()
                vd.start()

    def wait_fetch(fetch_idx, slot):
        for p in range(pages_per_fetch):
            kd, vd, page_idx = dma(fetch_idx, slot, p)

            @pl.when(page_idx < num_pages)
            def _():
                kd.wait()
                vd.wait()

    # init accumulators
    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(num_fetches > 0)
    def _():
        start_fetch(0, 0)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # [G, d]

    def body(fetch_idx, _):
        slot = fetch_idx % 2
        next_slot = (fetch_idx + 1) % 2

        @pl.when(fetch_idx + 1 < num_fetches)
        def _():
            start_fetch(fetch_idx + 1, next_slot)

        wait_fetch(fetch_idx, slot)

        base = fetch_idx * fetch_rows
        row_valid = (base + jax.lax.broadcasted_iota(
            jnp.int32, (fetch_rows, 1), 0)) < seq_len  # [fetch_rows, 1]
        k = k_buf[slot].reshape(fetch_rows, d).astype(jnp.float32)
        # Zero garbage rows (unfetched pages): 0-probability x NaN = NaN
        # would otherwise poison the accumulator.
        v = jnp.where(row_valid,
                      v_buf[slot].reshape(fetch_rows, d).astype(jnp.float32),
                      0.0)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [G, fetch_rows]
        scores = jnp.where(row_valid.reshape(1, fetch_rows), scores, NEG_INF)

        m_prev = m_ref[:, :1]                       # [G, 1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)             # [G, 1]
        p = jnp.exp(scores - m_new)                 # [G, fetch_rows]
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:, :1] = m_new
        l_ref[:, :1] = l_new
        return 0

    jax.lax.fori_loop(0, num_fetches, body, 0)

    l = jnp.maximum(l_ref[:, :1], 1e-30)
    out_ref[0, 0] = (acc_ref[:] / l).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "scale", "pages_per_fetch", "interpret"))
def paged_attention_decode(
    q: jnp.ndarray,            # [S, h, d]
    k_pages: jnp.ndarray,      # [kvh, num_slots, d]
    v_pages: jnp.ndarray,      # [kvh, num_slots, d]
    block_tables: jnp.ndarray,  # [S, max_pages] i32
    seq_lens: jnp.ndarray,     # [S] i32
    *,
    page_size: int,
    scale: float,
    pages_per_fetch: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    S, h, d = q.shape
    kvh, num_slots, _ = k_pages.shape
    G = h // kvh
    # Pad the GQA group up to the sublane tile (8 f32 / 16 bf16) so the
    # [1, 1, G, d] q block is Mosaic-tileable; padded rows cost nothing
    # (decode attention is DMA-bound).
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    G_pad = max(cdiv(G, sublane) * sublane, sublane)
    q_grouped = q.reshape(S, kvh, G, d)
    if G_pad != G:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, G_pad - G),
                                        (0, 0)))
    kp = k_pages.reshape(kvh, num_slots // page_size, page_size, d)
    vp = v_pages.reshape(kvh, num_slots // page_size, page_size, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, kvh),
        in_specs=[
            # q group for (s, j): [1, 1, G_pad, d] block of [S, kvh, G_pad, d]
            pl.BlockSpec((1, 1, G_pad, d), lambda s, j, *_: (s, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # k_pages stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # v_pages stay in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, G_pad, d),
                               lambda s, j, *_: (s, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_fetch, page_size, d), k_pages.dtype),
            pltpu.VMEM((2, pages_per_fetch, page_size, d), v_pages.dtype),
            pltpu.VMEM((G_pad, d), jnp.float32),
            pltpu.VMEM((G_pad, 128), jnp.float32),
            pltpu.VMEM((G_pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, pages_per_fetch)),
        ],
    )

    kernel = pl.pallas_call(
        functools.partial(_decode_kernel, page_size=page_size,
                          pages_per_fetch=pages_per_fetch, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, kvh, G_pad, d), q.dtype),
        interpret=interpret,
    )
    out = kernel(block_tables, seq_lens, q_grouped, kp, vp)
    return out[:, :, :G, :].reshape(S, h, d)
