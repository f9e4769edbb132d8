"""Pallas TPU ragged prefill attention kernel over paged KV.

TPU-native replacement for the reference's varlen flash-attention prefill
(reference: light_vllm/decoding/backends/attention/backends/flash_attn.py:522
flash_attn_varlen_func and the Triton prefix-prefill kernel,
decoding/backends/attention/ops/prefix_prefill.py): each query tile of a
prefill (or chunked-prefill continuation) attends to its sequence's paged KV
context [0, seq_len) with causal masking, including the prefix-cache-hit
case where the query chunk starts mid-context.

Host precomputes a tile map (one entry per (seq, q-tile)); the kernel grid is
(num_tiles,). Pages are streamed once per tile (double-buffered DMA), all
query heads computed per instance (GQA groups are static loops over kv
heads).

Layout:
    q            [Tpad, h, d]   (flat ragged tokens; chunks 128-aligned)
    kv_pages     [num_slots, 2*kvh, d] combined cache
    tile_seq     [NT]  seq slot of tile (-1 = empty tile)
    tile_qstart  [NT]  flat row where the tile starts
    seq_lens     [S]   total kv len of seq (incl. this chunk)
    ctx_lens     [S]   tokens already in cache before this chunk
    chunk_starts [S]   flat row where the seq's chunk begins
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_vllm_tpu.ops.fp8_cast import upcast_kernel_operand

NEG_INF = -1e30

TILE_Q = 128


def _prefill_kernel(
    # scalar prefetch
    tile_seq_ref, tile_qstart_ref, block_tables_ref, seq_lens_ref,
    ctx_lens_ref, chunk_starts_ref, layer_ref,
    # inputs
    q_hbm,             # [Tpad, kvh, G, d] ANY
    kv_pages_hbm,      # [L, P, page_size, 2*kvh, d] ANY
    # outputs
    out_hbm,           # [Tpad, kvh, G, d] ANY
    # scratch
    q_buf,             # [TILE_Q, kvh, G_pad, d]
    o_buf,             # [TILE_Q, kvh, G_pad, d]
    kv_buf,            # [2, R, 2*kvh, d]
    acc_ref,           # [kvh, TILE_Q * G, d] f32
    m_ref, l_ref,      # [kvh, TILE_Q * G, 128] f32
    q_sem, o_sem, sems,
    *,
    page_size: int,
    pages_per_fetch: int,
    scale: float,
    kvh: int,
    num_groups: int,   # true GQA group size G (q_buf is padded to G_pad)
    sliding_window=None,
    soft_cap=None,
    packed: bool = False,
):
    t = pl.program_id(0)
    s = tile_seq_ref[t]

    # Zero the KV scratch once: pages inside a fetch window but past the
    # causal horizon are never DMA'd, yet their rows still enter the PV
    # dot with p == 0 — and 0 * NaN(uninitialized VMEM) = NaN poisons the
    # accumulator (same guard as the decode kernel's inst == 0 zeroing).
    @pl.when(t == 0)
    def _zero_scratch():
        kv_buf[...] = jnp.zeros_like(kv_buf)

    @pl.when(s >= 0)
    def _run():
        q_start = tile_qstart_ref[t]
        seq_len = seq_lens_ref[s]
        ctx_len = ctx_lens_ref[s]
        seq_q_start = chunk_starts_ref[s]
        G, d = num_groups, q_buf.shape[3]
        R = pages_per_fetch * page_size
        # Compute on the TRUE G rows (TILE_Q*G is always sublane-aligned
        # since TILE_Q=128) — padding G to the sublane tile inside the
        # score/softmax math would inflate every op G_pad/G-fold.
        rows = TILE_Q * G

        qdma = pltpu.make_async_copy(
            q_hbm.at[pl.ds(q_start, TILE_Q)], q_buf, q_sem)
        qdma.start()

        # Causal horizon: no row of this tile attends past the tile's
        # LAST query position, so pages beyond it are never fetched —
        # early tiles of a long prefill stream ~half the context on
        # average (the quadratic→triangular page-walk a varlen flash
        # kernel gets for free; reference: flash_attn.py:522).
        last_abs = ctx_len + (q_start - seq_q_start) + TILE_Q - 1
        kv_hi = jnp.minimum(seq_len, last_abs + 1)
        num_pages = (kv_hi + page_size - 1) // page_size
        if sliding_window is None:
            start_page = jnp.int32(0)
        else:
            # Lowest kv position any row of this tile may attend: the
            # tile's first query row is at abs position ctx + (q_start -
            # seq_q_start); earlier pages hold only rotated-out history.
            abs0 = ctx_len + (q_start - seq_q_start)
            start_page = jnp.maximum(abs0 + 1 - sliding_window, 0) \
                // page_size
        num_fetches = (num_pages - start_page
                       + pages_per_fetch - 1) // pages_per_fetch

        def dma(fetch_idx, slot, p):
            page_idx = start_page + fetch_idx * pages_per_fetch + p
            page_id = block_tables_ref[s, jnp.minimum(
                page_idx, block_tables_ref.shape[1] - 1)]
            return (pltpu.make_async_copy(
                kv_pages_hbm.at[layer_ref[0], page_id],
                kv_buf.at[slot, pl.ds(p * page_size, page_size)],
                sems.at[slot, p]), page_idx)

        def start_fetch(fetch_idx, slot):
            for p in range(pages_per_fetch):
                c, page_idx = dma(fetch_idx, slot, p)

                @pl.when(page_idx < num_pages)
                def _():
                    c.start()

        def wait_fetch(fetch_idx, slot):
            for p in range(pages_per_fetch):
                c, page_idx = dma(fetch_idx, slot, p)

                @pl.when(page_idx < num_pages)
                def _():
                    c.wait()

        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

        start_fetch(0, 0)
        qdma.wait()
        # Pre-scale q once per tile (native dtype) so the score dots run
        # on unconverted operands — the per-fetch f32 upconverts were
        # measurable VPU traffic.
        q_buf[...] = q_buf[...] * scale
        compute_dt = jnp.bfloat16 \
            if jnp.dtype(kv_buf.dtype).itemsize <= 2 else kv_buf.dtype

        # absolute position of each q row: token index = q_start + row // G
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        tok_in_seq = (q_start + row_ids // G) - seq_q_start
        abs_pos = ctx_len + tok_in_seq  # [rows, 1]
        q_valid = (tok_in_seq >= 0) & (abs_pos < seq_len)

        def body(fetch_idx, _):
            slot = fetch_idx % 2
            next_slot = (fetch_idx + 1) % 2

            @pl.when(fetch_idx + 1 < num_fetches)
            def _():
                start_fetch(fetch_idx + 1, next_slot)

            wait_fetch(fetch_idx, slot)

            base = (start_page + fetch_idx * pages_per_fetch) * page_size
            col_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
            kv_valid = col_ids < seq_len
            col_rows = base + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            causal = col_ids <= abs_pos          # [rows, R]
            mask = causal & kv_valid & q_valid
            if sliding_window is not None:
                mask &= col_ids > abs_pos - sliding_window

            kv = kv_buf[slot]  # [R, 2*kvh, d] (K/V interleaved per head)
            for j in range(kvh):
                q = q_buf[:, j, :G, :].reshape(rows, d)
                if packed:
                    # head_dim-64 lane packing (see decode kernel): row j
                    # is K_j | V_j across 128 lanes; q's V lanes are zero.
                    k = v = jnp.where(col_rows < seq_len, kv[:, j, :],
                                      jnp.zeros((), kv.dtype))
                else:
                    k = kv[:, 2 * j, :]
                    v = jnp.where(col_rows < seq_len, kv[:, 2 * j + 1, :],
                                  jnp.zeros((), kv.dtype))
                scores = jax.lax.dot_general(
                    q.astype(compute_dt),
                    upcast_kernel_operand(k, compute_dt),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [rows, R]
                if soft_cap is not None:
                    scores = soft_cap * jnp.tanh(scores / soft_cap)
                scores = jnp.where(mask, scores, NEG_INF)

                m_prev = m_ref[j, :, :1]
                m_cur = jnp.max(scores, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(scores - m_new)
                l_ref[j, :, :1] = alpha * l_ref[j, :, :1] + jnp.sum(
                    p, axis=-1, keepdims=True)
                acc_ref[j] = acc_ref[j] * alpha + jax.lax.dot_general(
                    p.astype(compute_dt),
                    upcast_kernel_operand(v, compute_dt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_ref[j, :, :1] = m_new
            return 0

        jax.lax.fori_loop(0, num_fetches, body, 0)

        for j in range(kvh):
            l = jnp.maximum(l_ref[j, :, :1], 1e-30)
            o_buf[:, j, :G, :] = (acc_ref[j] / l).reshape(
                TILE_Q, G, d).astype(o_buf.dtype)
        odma = pltpu.make_async_copy(
            o_buf, out_hbm.at[pl.ds(q_start, TILE_Q)], o_sem)
        odma.start()
        odma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "scale", "pages_per_fetch",
                     "sliding_window", "soft_cap", "interpret"))
def prefill_paged_attention(
    q: jnp.ndarray,            # [Tpad, h, d]; Tpad % TILE_Q == 0
    kv_pages: jnp.ndarray,     # [num_slots, 2*kvh, d], or stacked
                               # [L, num_slots, 2*kvh, d] with layer_idx
    tile_seq: jnp.ndarray,     # [NT] i32, -1 = skip
    tile_qstart: jnp.ndarray,  # [NT] i32
    block_tables: jnp.ndarray,  # [S, max_pages]
    seq_lens: jnp.ndarray,     # [S]
    ctx_lens: jnp.ndarray,     # [S]
    chunk_starts: jnp.ndarray,  # [S]
    *,
    page_size: int,
    scale: float,
    pages_per_fetch: int = 0,  # 0 = auto: ~256-token chunks, VMEM-capped
    sliding_window=None,
    soft_cap=None,
    layer_idx=None,            # scalar i32 selecting the stacked layer
    interpret: bool = False,
) -> jnp.ndarray:
    """Stacked form: see paged_attention_decode — avoids per-scan-iteration
    materialization of a layer slice."""
    Tpad, h, d = q.shape
    if layer_idx is None:
        kv_pages = kv_pages[None]
        layer_idx = jnp.zeros((), jnp.int32)
    L, num_slots, kvh2, _ = kv_pages.shape
    kvh = kvh2 // 2
    G = h // kvh
    # Pad GQA group to the sublane tile so in-kernel reshapes stay aligned.
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    G_pad = max((G + sublane - 1) // sublane * sublane, sublane)
    NT = tile_seq.shape[0]
    if not pages_per_fetch:
        # ~256-token chunks: few fetch iterations (each runs a full
        # mask + online-softmax round per kv head), capped so the
        # double-buffered chunk scratch stays ≤ 4 MB.
        # Chunk-size A/B on chip (256-token seqs, profiled device time):
        # 128-tok 137us, 256-tok 91us, 512-tok 129us per layer call — the
        # score/softmax math runs over the full R columns, so chunks much
        # longer than the typical per-seq context are mostly masked waste.
        pages_per_fetch = max(1, 256 // page_size)
        item = jnp.dtype(kv_pages.dtype).itemsize
        while 2 * pages_per_fetch * page_size * kvh2 * d * item \
                > 4 * 1024 * 1024 and pages_per_fetch > 1:
            pages_per_fetch //= 2
    R = pages_per_fetch * page_size
    q_grouped = q.reshape(Tpad, kvh, G, d)
    if G_pad != G:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, G_pad - G),
                                        (0, 0)))
    # head_dim-64 lane packing: see paged_attention_decode.
    packed = d == 64
    if packed:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, 0), (0, 64)))
        d_k, kv_rows = 128, kvh
        kv = kv_pages.reshape(L, num_slots // page_size, page_size, kvh,
                              128)
    else:
        d_k, kv_rows = d, 2 * kvh
        kv = kv_pages.reshape(L, num_slots // page_size, page_size,
                              2 * kvh, d)
    layer_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((TILE_Q, kvh, G_pad, d_k), q.dtype),
            pltpu.VMEM((TILE_Q, kvh, G_pad, d_k), q.dtype),
            pltpu.VMEM((2, R, kv_rows, d_k), kv_pages.dtype),
            pltpu.VMEM((kvh, TILE_Q * G, d_k), jnp.float32),
            pltpu.VMEM((kvh, TILE_Q * G, 128), jnp.float32),
            pltpu.VMEM((kvh, TILE_Q * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, pages_per_fetch)),
        ],
    )

    kernel = pl.pallas_call(
        functools.partial(_prefill_kernel, page_size=page_size,
                          pages_per_fetch=pages_per_fetch, scale=scale,
                          kvh=kvh, num_groups=G,
                          sliding_window=sliding_window,
                          soft_cap=soft_cap, packed=packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tpad, kvh, G_pad, d_k), q.dtype),
        # 8-kv-head models (Llama-3-8B) need ~33M of scratch (q/o bufs +
        # per-head accumulators); the default scoped limit is 32M while
        # v5e has 128M physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )
    out = kernel(tile_seq, tile_qstart, block_tables, seq_lens, ctx_lens,
                 chunk_starts, layer_arr, q_grouped, kv)
    if packed:
        return out[:, :, :G, 64:].reshape(Tpad, h, d)
    return out[:, :, :G, :].reshape(Tpad, h, d)
