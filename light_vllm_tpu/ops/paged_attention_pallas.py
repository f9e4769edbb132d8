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
    seq_lens [S]                  (scalar-prefetched + a [S,1] VMEM copy)

Grid: (S / SEQ_BLOCK,). Design (re-measured r5 on v5e, see the
TARGET_CHUNK_TOKENS note for the numbers):

  - fetches KV in per-sequence chunks of R = pages_per_fetch * page_size
    tokens with double buffering, all pages of a sequence sharing ONE
    DMA semaphore (bounded sflag usage); physically-contiguous ascending
    page runs coalesce into a single multi-page DMA,
  - runs the per-(seq, kv-head) score and PV matmuls as static-addressed
    MXU dots into a shared VMEM scores scratch,
  - performs masking and the online-softmax update ONCE per chunk,
    batched over the whole [B, kvh, G, R] block, instead of per sequence.

The dominant cost is the per-chunk panel sweep (paid in full for partial
chunks), so the chunk defaults to ONE PAGE: total panel columns then
track the true context length instead of rounding up to a large R.

GQA groups are static loops over kv heads.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_vllm_tpu.ops.fp8_cast import upcast_kernel_operand
from light_vllm_tpu.utils import cdiv

NEG_INF = -1e30

SEQ_BLOCK = 8             # sequences per kernel instance (adaptive, see below)
# Per-sequence KV tokens fetched per chunk. ONE PAGE per chunk (r5,
# measured on v5e at 8B decode shapes, S=256, ctx~260-288, page 32):
# the kernel's cost is the per-chunk [B, kvh, G_pad, R] panel sweep
# (score/PV dots + batched online softmax), paid IN FULL for a chunk no
# matter how few of its pages are valid — so a context of 9 pages at
# R=256 processes 512 panel columns for 288 tokens of work. Shrinking
# the chunk to one page processes only ceil(ctx/page) panels:
#     R=256: 97.7 ms/8-step window (gen 2530 tok/s)
#     R=128: 60.2 ms  (4037 tok/s)
#     R= 64: 49.5 ms  (4877 tok/s)
#     R= 32: 44.3 ms  (5367 tok/s)   <- default
# r4 had concluded the opposite ("DMA-dispatch-bound, fetch ~512-token
# chunks") from per-dispatch timings that turned out to be dominated by
# the remote relay's ~27 ms RTT (see benchmarks/profile_8b.py pipelined
# timing). Override per call with pages_per_fetch or env LVT_PA_PPF.
TARGET_CHUNK_TOKENS = 32
# Double-buffered chunk scratch budget; B capped at 8 (B=16 measured
# slower: the panel sweep scales with B too).
KV_BUF_BUDGET = 8 * 1024 * 1024


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [S, max_pages] SMEM
    seq_lens_ref,      # [S] SMEM
    layer_ref,         # [1] SMEM — layer slice of the stacked cache
    contig_ref,        # [S, n_chunks] SMEM — first page id of chunk if the
                       # whole ppf-page run is physically contiguous
                       # ascending, else -1 (coalesced-DMA fast path)
    # inputs
    q_ref,             # [B, kvh, G_pad, d] VMEM
    sl_ref,            # [B, 1] i32 VMEM (vector copy of seq_lens)
    kv_pages_hbm,      # [L, P, page_size*rows, d] ANY
    # outputs
    out_ref,           # [B, kvh, G_pad, d] VMEM
    # scratch
    kv_buf,            # [2, B, ppf, page_size*rows, d] VMEM
    scores_ref,        # [B, kvh, G_pad, R] f32
    acc_ref,           # [B, kvh, G_pad, d] f32
    m_ref, l_ref,      # [B, kvh, G_pad, 128] f32
    sems,              # DMA semaphores [2, B] (shared per sequence)
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
    rows = kvh if packed else 2 * kvh

    # Uninitialized VMEM scratch may hold NaN/Inf bit patterns from other
    # kernels; 0 * NaN = NaN would poison the (masked, p == 0) PV products.
    @pl.when(inst == 0)
    def _():
        kv_buf[...] = jnp.zeros_like(kv_buf)

    def seq_len_of(b):
        return seq_lens_ref[inst * B + b]

    def num_pages_of(b):
        return (seq_len_of(b) + page_size - 1) // page_size

    def start_page_of(b):
        """First page the (single, last-token) query may attend into."""
        if sliding_window is None:
            return jnp.int32(0)
        return jnp.maximum(seq_len_of(b) - sliding_window, 0) // page_size

    # max chunk span across the block drives the shared fetch loop;
    # out-of-window pages are never fetched (their physical blocks were
    # rotated anyway).
    max_span = num_pages_of(0) - start_page_of(0)
    for b in range(1, B):
        max_span = jnp.maximum(max_span,
                               num_pages_of(b) - start_page_of(b))
    num_chunks = (max_span + pages_per_fetch - 1) // pages_per_fetch

    def dma(b, chunk, slot, p):
        page_idx = start_page_of(b) + chunk * pages_per_fetch + p
        page_id = block_tables_ref[inst * B + b, jnp.minimum(
            page_idx, block_tables_ref.shape[1] - 1)]
        return (pltpu.make_async_copy(
            kv_pages_hbm.at[layer_ref[0], page_id],
            kv_buf.at[slot, b, p],
            sems.at[slot, b]), page_idx)

    # Coalesced fast path: when a chunk's ppf pages are one ascending
    # physical run (the allocator hands prefill allocations out that way),
    # ONE ppf-page DMA replaces ppf per-page DMAs + their scalar-core
    # issue cost — the dominant term of the measured 0.93 ms/layer
    # (73k descriptors/step at 8B shapes). Gated off under sliding window
    # (per-seq start offsets break chunk/table alignment).
    use_contig = pages_per_fetch > 1 and sliding_window is None

    def contig_dma(b, chunk, slot):
        first = contig_ref[inst * B + b, chunk]
        return pltpu.make_async_copy(
            kv_pages_hbm.at[layer_ref[0],
                            pl.ds(jnp.maximum(first, 0), pages_per_fetch)],
            kv_buf.at[slot, b],
            sems.at[slot, b]), first

    def _fetch(chunk, slot, run):
        for b in range(B):
            if use_contig:
                big, first = contig_dma(b, chunk, slot)

                @pl.when(first >= 0)
                def _():
                    run(big)

            for p in range(pages_per_fetch):
                c, page_idx = dma(b, chunk, slot, p)
                cond = page_idx < num_pages_of(b)
                if use_contig:
                    first = contig_ref[inst * B + b, chunk]
                    cond &= first < 0

                @pl.when(cond)
                def _():
                    run(c)

    def start_fetch(chunk, slot):
        _fetch(chunk, slot, lambda c: c.start())

    def wait_fetch(chunk, slot):
        # Waits mirror starts 1:1; the shared per-sequence semaphore counts
        # bytes, so order within a sequence is irrelevant.
        _fetch(chunk, slot, lambda c: c.wait())

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    # Batched per-sequence mask ingredients ([B, 1] vectors).
    sl_vec = sl_ref[...]  # [B, 1] i32
    if sliding_window is not None:
        win_vec = jnp.maximum(sl_vec - sliding_window, 0)
        start_page_vec = win_vec // page_size
    else:
        win_vec = None
        start_page_vec = jnp.zeros_like(sl_vec)

    @pl.when(num_chunks > 0)
    def _():
        start_fetch(0, 0)

    def body(chunk, _):
        slot = chunk % 2
        next_slot = (chunk + 1) % 2

        @pl.when(chunk + 1 < num_chunks)
        def _():
            start_fetch(chunk + 1, next_slot)

        wait_fetch(chunk, slot)

        # ---- scores: one static-addressed dot per (b, kv-head) ----
        for b in range(B):
            # [ppf, page_size*rows, d] -> [R, rows, d] (leading reshape)
            kv3 = kv_buf[slot, b].reshape(R, rows, d)
            for j in range(kvh):
                q = q_ref[b, j].astype(jnp.float32) * scale  # [G, d]
                k = kv3[:, j if packed else 2 * j, :]        # [R, d]
                scores_ref[b, j] = jax.lax.dot_general(
                    q, upcast_kernel_operand(k, jnp.float32),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [G, R]

        # ---- masking + online softmax, batched over [B, kvh, G, R] ----
        scores = scores_ref[...]
        if soft_cap is not None:
            scores = soft_cap * jnp.tanh(scores / soft_cap)
        base = (start_page_vec + chunk * pages_per_fetch) * page_size
        pos = base.reshape(B, 1, 1, 1) + jax.lax.broadcasted_iota(
            jnp.int32, (B, 1, 1, R), 3)                      # [B,1,1,R]
        valid = pos < sl_vec.reshape(B, 1, 1, 1)
        if win_vec is not None:
            valid &= pos >= win_vec.reshape(B, 1, 1, 1)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, :, :, :1]                          # [B,kvh,G,1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)                          # [B,kvh,G,R]
        l_ref[:, :, :, :1] = alpha * l_ref[:, :, :, :1] + \
            jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :, :, :1] = m_new
        scores_ref[...] = p
        acc_ref[...] = acc_ref[...] * alpha

        # ---- PV: one static-addressed dot per (b, kv-head) ----
        for b in range(B):
            kv3 = kv_buf[slot, b].reshape(R, rows, d)
            for j in range(kvh):
                v = kv3[:, j if packed else 2 * j + 1, :]    # [R, d]
                acc_ref[b, j] += jax.lax.dot_general(
                    scores_ref[b, j], upcast_kernel_operand(v, jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)

    l = jnp.maximum(l_ref[:, :, :, :1], 1e-30)
    out_ref[...] = (acc_ref[...] / l).astype(out_ref.dtype)


def _pick_block_params(S, page_size, rows, d_k, itemsize):
    """Pick (seq_block, pages_per_fetch) under the VMEM chunk budget.

    seq_block must stay >= 8 when smaller than S: the per-block seq_lens
    BlockSpec is (B, 1) and Mosaic requires the sublane dim to be a
    multiple of 8 (or the full array) — 8-kv-head models (Llama-3-8B)
    hit this with big per-seq chunks, so shrink the chunk first."""
    ppf = max(1, TARGET_CHUNK_TOKENS // page_size)
    per_seq = 2 * ppf * page_size * rows * d_k * itemsize
    B = max(1, min(8, KV_BUF_BUDGET // per_seq, S))
    while B < min(8, S) and ppf > 1:
        ppf //= 2
        per_seq //= 2
        B = max(1, min(8, KV_BUF_BUDGET // per_seq, S))
    return B, ppf


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
    pages_per_fetch: int = 0,  # 0 = auto (TARGET_CHUNK_TOKENS / page_size)
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
    # head_dim 64 (Qwen2-0.5B class): Mosaic can't tile 64-lane arrays, so
    # reinterpret the per-head-interleaved cache [.., 2*kvh, 64] as
    # [.., kvh, 128] (pure reshape: K_j | V_j share a 128-lane row) and
    # zero-pad q's V lanes — see the packed branch in _decode_kernel.
    packed = d == 64
    rows = kvh if packed else 2 * kvh
    d_k = 128 if packed else d
    B, ppf = _pick_block_params(S, page_size, rows, d_k,
                                jnp.dtype(kv_pages.dtype).itemsize)
    if pages_per_fetch:
        ppf = pages_per_fetch
    import os as _os
    _ppf_env = _os.environ.get("LVT_PA_PPF")  # perf-tuning override
    if _ppf_env:
        ppf = int(_ppf_env)
    # Pad the GQA group up to the sublane tile so q blocks are tileable;
    # padded rows cost nothing (decode attention is overhead-bound).
    # q rides in f32 so the G axis tiles at sublane 8 instead of bf16's
    # 16: every kernel vector op (mask, online softmax) and score/PV dot
    # sweeps the PADDED [B, kvh, G_pad, R] panel, so at G=4 (Llama-3-8B
    # GQA) halving G_pad halves the dominant VPU work. q is upcast to f32
    # inside the kernel anyway; the extra q bytes are noise next to KV.
    in_dtype = q.dtype
    q = q.astype(jnp.float32)
    sublane = 8
    G_pad = max(cdiv(G, sublane) * sublane, sublane)
    q_grouped = q.reshape(S, kvh, G, d)
    if G_pad != G:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, G_pad - G),
                                        (0, 0)))
    if packed:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, 0), (0, 64)))
    # Flatten each page to a clean 2D [page_size*rows, d] tile (free
    # reshape) — avoids sub-8-sublane [page_size, rows, d] VMEM tiles.
    kv = kv_pages.reshape(L, num_slots // page_size, page_size * rows, d_k)

    # Pad the batch to a multiple of the seq block (padded rows have
    # seq_len 0: no DMAs, fully masked, l clamped).
    S_pad = cdiv(S, B) * B
    if S_pad != S:
        q_grouped = jnp.pad(q_grouped, ((0, S_pad - S), (0, 0), (0, 0),
                                        (0, 0)))
        block_tables = jnp.pad(block_tables, ((0, S_pad - S), (0, 0)))
        seq_lens = jnp.pad(seq_lens, (0, S_pad - S))

    layer_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    sl_vmem = seq_lens.astype(jnp.int32).reshape(S_pad, 1)
    R = ppf * page_size

    # Per-(seq, chunk) coalescing plan: first page id when the chunk's ppf
    # pages are a full ascending physical run, else -1. Vectorized here so
    # the kernel's scalar core does one SMEM load per chunk instead of ppf
    # table walks.
    n_chunks_max = max(1, cdiv(block_tables.shape[1], ppf))
    if ppf > 1 and sliding_window is None:
        btp = jnp.pad(block_tables,
                      ((0, 0), (0, n_chunks_max * ppf -
                                block_tables.shape[1])))
        btc = btp.reshape(S_pad, n_chunks_max, ppf)
        ascending = jnp.all(jnp.diff(btc, axis=-1) == 1, axis=-1)
        num_pages_vec = (seq_lens.astype(jnp.int32) + page_size - 1) \
            // page_size
        chunk_end = (jnp.arange(n_chunks_max, dtype=jnp.int32) + 1) * ppf
        full = chunk_end[None, :] <= num_pages_vec[:, None]
        contig = jnp.where(ascending & full, btc[:, :, 0],
                           -1).astype(jnp.int32)
    else:
        contig = jnp.full((S_pad, n_chunks_max), -1, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S_pad // B,),
        in_specs=[
            pl.BlockSpec((B, kvh, G_pad, d_k), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # kv pages stay in HBM
        ],
        out_specs=pl.BlockSpec((B, kvh, G_pad, d_k),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, B, ppf, page_size * rows, d_k), kv_pages.dtype),
            pltpu.VMEM((B, kvh, G_pad, R), jnp.float32),
            pltpu.VMEM((B, kvh, G_pad, d_k), jnp.float32),
            pltpu.VMEM((B, kvh, G_pad, 128), jnp.float32),
            pltpu.VMEM((B, kvh, G_pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
    )

    kernel = pl.pallas_call(
        functools.partial(_decode_kernel, page_size=page_size,
                          pages_per_fetch=ppf, scale=scale,
                          kvh=kvh, seq_block=B,
                          sliding_window=sliding_window,
                          soft_cap=soft_cap, packed=packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S_pad, kvh, G_pad, d_k), q.dtype),
        # headroom for 8-kv-head models; v5e has 128M physical VMEM (the
        # default scoped limit is far lower)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )
    out = kernel(block_tables, seq_lens, layer_arr, contig, q_grouped,
                 sl_vmem, kv)
    out = out.astype(in_dtype)  # kernel panel rides f32 (sublane 8)
    if packed:
        return out[:S, :, :G, 64:].reshape(S, h, d)
    return out[:S, :, :G, :].reshape(S, h, d)
