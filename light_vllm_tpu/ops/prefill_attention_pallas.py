"""Pallas TPU ragged prefill attention kernel over paged KV.

TPU-native replacement for the reference's varlen flash-attention prefill
(reference: light_vllm/decoding/backends/attention/backends/flash_attn.py:522
flash_attn_varlen_func and the Triton prefix-prefill kernel,
decoding/backends/attention/ops/prefix_prefill.py): each query tile of a
prefill (or chunked-prefill continuation) attends to its sequence's paged KV
context [0, seq_len) with causal masking, including the prefix-cache-hit
case where the query chunk starts mid-context.

Host precomputes a tile map (one entry per (seq, q-tile)); the kernel grid is
(num_tiles, kvh). Pages are DMA'd from HBM double-buffered, exactly like the
decode kernel, but each instance processes TILE_Q query rows x G heads.

Layout:
    q            [Tpad, h, d]     (flat ragged tokens, padded; Tpad % TILE_Q == 0)
    k_pages      [kvh, P, page_size, d]
    tile_seq     [NT]  seq slot of tile (-1 = empty tile)
    tile_qstart  [NT]  flat row where the tile starts
    seq_lens     [S]   total kv len of seq (incl. this chunk)
    ctx_lens     [S]   tokens already in cache before this chunk
    qsl          [S+1] query_start_loc
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

TILE_Q = 128


def _prefill_kernel(
    # scalar prefetch
    tile_seq_ref, tile_qstart_ref, block_tables_ref, seq_lens_ref,
    ctx_lens_ref, chunk_starts_ref,
    # inputs
    q_hbm,             # [Tpad, kvh, G, d] ANY
    k_pages_hbm,       # [kvh, P, page_size, d] ANY
    v_pages_hbm,
    # outputs
    out_hbm,           # [Tpad, kvh, G, d] ANY
    # scratch
    q_buf,             # [TILE_Q, G, d]
    o_buf,             # [TILE_Q, G, d]
    k_buf, v_buf,      # [2, R, d]
    acc_ref,           # [TILE_Q * G, d] f32
    m_ref, l_ref,      # [TILE_Q * G, 128] f32
    q_sem, o_sem, sems,
    *,
    page_size: int,
    pages_per_fetch: int,
    scale: float,
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    s = tile_seq_ref[t]

    @pl.when(s >= 0)
    def _run():
        q_start = tile_qstart_ref[t]
        seq_len = seq_lens_ref[s]
        ctx_len = ctx_lens_ref[s]
        seq_q_start = chunk_starts_ref[s]
        G, d = q_buf.shape[1], q_buf.shape[2]
        R = pages_per_fetch * page_size
        rows = TILE_Q * G

        # fetch q tile for this kv head
        qdma = pltpu.make_async_copy(
            q_hbm.at[pl.ds(q_start, TILE_Q), j], q_buf, q_sem)
        qdma.start()

        num_pages = (seq_len + page_size - 1) // page_size
        num_fetches = (num_pages + pages_per_fetch - 1) // pages_per_fetch

        def dma(fetch_idx, slot, p):
            page_idx = fetch_idx * pages_per_fetch + p
            page_id = block_tables_ref[s, jnp.minimum(
                page_idx, block_tables_ref.shape[1] - 1)]
            return (
                pltpu.make_async_copy(k_pages_hbm.at[j, page_id],
                                      k_buf.at[slot, pl.ds(p * page_size,
                                                           page_size)],
                                      sems.at[slot, 0, p]),
                pltpu.make_async_copy(v_pages_hbm.at[j, page_id],
                                      v_buf.at[slot, pl.ds(p * page_size,
                                                           page_size)],
                                      sems.at[slot, 1, p]),
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

        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

        start_fetch(0, 0)
        qdma.wait()
        q = q_buf[:].reshape(rows, d).astype(jnp.float32) * scale

        # absolute position of each q row (row r of tile → token
        # q_start + r // G... careful: layout [TILE_Q, G, d] flattens to
        # row = qt * G + g, so token index = q_start + row // G).
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        tok_in_seq = (q_start + row_ids // G) - seq_q_start  # offset in chunk
        abs_pos = ctx_len + tok_in_seq  # [rows, 1]
        q_valid = (tok_in_seq >= 0) & (abs_pos < seq_len)

        def body(fetch_idx, _):
            slot = fetch_idx % 2
            next_slot = (fetch_idx + 1) % 2

            @pl.when(fetch_idx + 1 < num_fetches)
            def _():
                start_fetch(fetch_idx + 1, next_slot)

            wait_fetch(fetch_idx, slot)

            base = fetch_idx * R
            col_ids = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, R), 1)
            kv_valid = col_ids < seq_len  # [1, R]
            col_ids_rows = base + jax.lax.broadcasted_iota(
                jnp.int32, (R, 1), 0)
            k = k_buf[slot].astype(jnp.float32)
            v = jnp.where(col_ids_rows < seq_len,
                          v_buf[slot].astype(jnp.float32), 0.0)
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [rows, R]
            causal = col_ids <= abs_pos  # [rows, R]
            mask = causal & kv_valid & q_valid
            scores = jnp.where(mask, scores, NEG_INF)

            m_prev = m_ref[:, :1]
            m_cur = jnp.max(scores, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)
            l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(
                p, axis=-1, keepdims=True)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:, :1] = m_new
            return 0

        jax.lax.fori_loop(0, num_fetches, body, 0)

        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_buf[:] = (acc_ref[:] / l).reshape(TILE_Q, G, d).astype(o_buf.dtype)
        odma = pltpu.make_async_copy(
            o_buf, out_hbm.at[pl.ds(q_start, TILE_Q), j], o_sem)
        odma.start()
        odma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "scale", "pages_per_fetch", "interpret"))
def prefill_paged_attention(
    q: jnp.ndarray,            # [Tpad, h, d]; Tpad % TILE_Q == 0
    k_pages: jnp.ndarray,      # [kvh, num_slots, d]
    v_pages: jnp.ndarray,
    tile_seq: jnp.ndarray,     # [NT] i32, -1 = skip
    tile_qstart: jnp.ndarray,  # [NT] i32
    block_tables: jnp.ndarray,  # [S, max_pages]
    seq_lens: jnp.ndarray,     # [S]
    ctx_lens: jnp.ndarray,     # [S]
    chunk_starts: jnp.ndarray,  # [S] flat row where each seq's chunk starts
    *,
    page_size: int,
    scale: float,
    pages_per_fetch: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    Tpad, h, d = q.shape
    kvh, num_slots, _ = k_pages.shape
    G = h // kvh
    # Pad GQA group to the sublane tile (see paged_attention_pallas).
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    G_pad = max((G + sublane - 1) // sublane * sublane, sublane)
    q_grouped = q.reshape(Tpad, kvh, G, d)
    if G_pad != G:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, G_pad - G),
                                        (0, 0)))
    NT = tile_seq.shape[0]
    kp = k_pages.reshape(kvh, num_slots // page_size, page_size, d)
    vp = v_pages.reshape(kvh, num_slots // page_size, page_size, d)
    R = pages_per_fetch * page_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(NT, kvh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((TILE_Q, G_pad, d), q.dtype),
            pltpu.VMEM((TILE_Q, G_pad, d), q.dtype),
            pltpu.VMEM((2, R, d), k_pages.dtype),
            pltpu.VMEM((2, R, d), v_pages.dtype),
            pltpu.VMEM((TILE_Q * G_pad, d), jnp.float32),
            pltpu.VMEM((TILE_Q * G_pad, 128), jnp.float32),
            pltpu.VMEM((TILE_Q * G_pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2, pages_per_fetch)),
        ],
    )

    kernel = pl.pallas_call(
        functools.partial(_prefill_kernel, page_size=page_size,
                          pages_per_fetch=pages_per_fetch, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tpad, kvh, G_pad, d), q.dtype),
        interpret=interpret,
    )
    out = kernel(tile_seq, tile_qstart, block_tables, seq_lens, ctx_lens,
                 chunk_starts, q_grouped, kp, vp)
    return out[:, :, :G, :].reshape(Tpad, h, d)
