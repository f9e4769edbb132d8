"""Dense flash-attention Pallas kernel for encoder / prefill-only models.

TPU-native replacement for the reference's encoder backend zoo
(reference: light_vllm/prefill_only/backends/attention/ — FLASH_ATTN /
XFORMERS / SDPA / NAIVE collapse into one tiled kernel). The jnp
`dense_attention` baseline materializes the full [B, h, L, L] score
tensor — 8k-token BGE-M3-class inputs would need tens of GB. This kernel
streams K/V in 128-row tiles with an online softmax, so peak memory per
instance is O(TILE_Q * TILE_K): bounded at any sequence length.

Layout: q/k/v [B, L, h, d] (as dense_attention), mask [B, L] bool (True =
real token). GQA heads are expanded by the caller-side wrapper (encoder
models are h == kvh in practice). head_dim < 128 is zero-padded to the
lane width — zero lanes add nothing to q·kᵀ and the output slice drops
them.

Grid (B*h, Lq/TILE_Q, Lk/TILE_K), k innermost: the f32 accumulator and
the m/l softmax state persist in VMEM scratch across the k sweep; the
output tile is written on the last k iteration.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_vllm_tpu.utils import cdiv

NEG_INF = -1e30

TILE_Q = 128
TILE_K = 128


def _flash_kernel(
    q_ref,     # [1, TQ, dp]
    k_ref,     # [1, TK, dp]
    v_ref,     # [1, TK, dp]
    mask_ref,  # [1, 1, TK] i32 (1 = real token)
    out_ref,   # [1, TQ, dp]
    acc_ref,   # [TQ, dp] f32
    m_ref,     # [TQ, 128] f32
    l_ref,     # [TQ, 128] f32
    *,
    scale: float,
    causal: bool,
    num_k_tiles: int,
    tile_q: int,
    tile_k: int,
):
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    run = True
    if causal:
        # Tiles strictly above the diagonal contribute nothing.
        run = ik * tile_k <= iq * tile_q + tile_q - 1

    @pl.when(run)
    def _():
        q = q_ref[0].astype(jnp.float32) * scale          # [TQ, dp]
        k = k_ref[0].astype(jnp.float32)                  # [TK, dp]
        v = v_ref[0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TQ, TK]
        valid = (mask_ref[0, 0] > 0).reshape(1, tile_k)
        if causal:
            rows = iq * tile_q + jax.lax.broadcasted_iota(
                jnp.int32, (tile_q, tile_k), 0)
            cols = ik * tile_k + jax.lax.broadcasted_iota(
                jnp.int32, (tile_q, tile_k), 1)
            valid = valid & (cols <= rows)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1,
                                            keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        # Zero masked columns: exp(NEG_INF - m) is 0 unless the whole row
        # is masked (m == NEG_INF → p == 1); the where keeps those rows 0
        # so fully-padded rows output 0 like the jnp baseline.
        p = jnp.where(valid, p, 0.0)
        l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1,
                                                      keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:, :1] = m_new

    @pl.when(ik == num_k_tiles - 1)
    def _():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        out_ref[0] = (acc_ref[:] / l).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("causal", "scale", "interpret"))
def flash_attention_dense(
    q: jnp.ndarray,     # [B, L, h, d]
    k: jnp.ndarray,     # [B, L, kvh, d]
    v: jnp.ndarray,     # [B, L, kvh, d]
    mask: jnp.ndarray,  # [B, L] (nonzero = real token)
    *,
    causal: bool = False,
    scale=None,
    interpret: bool = False,
) -> jnp.ndarray:
    B, L, h, d = q.shape
    kvh = k.shape[2]
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = d ** -0.5
    dp = max(cdiv(d, 128) * 128, 128)
    # Adaptive tiles: long inputs amortize per-instance overhead with big
    # K tiles (measured ~6x on 8k-token encode); short inputs keep 128 so
    # BERT-class batches don't pad 8x. Both are powers of two, so the
    # padded length only needs to be a multiple of the larger tile.
    tile_q = TILE_Q if L < 512 else 256
    tile_k = TILE_K if L < 2048 else 1024
    Lp = cdiv(L, max(tile_q, tile_k)) * max(tile_q, tile_k)

    def prep(x):  # [B, L, h, d] → [B*h, Lp, dp]
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0), (0, dp - d)))
        return x.transpose(0, 2, 1, 3).reshape(B * h, Lp, dp)

    qt, kt, vt = prep(q), prep(k), prep(v)
    mask_i = jnp.pad(mask.astype(jnp.int32),
                     ((0, 0), (0, Lp - L)))[:, None, :]  # [B, 1, Lp]
    nq, nk = Lp // tile_q, Lp // tile_k

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=float(scale), causal=causal,
                          num_k_tiles=nk, tile_q=tile_q, tile_k=tile_k),
        grid=(B * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, tile_q, dp), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, tile_k, dp), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, tile_k, dp), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, 1, tile_k),
                         lambda bh, iq, ik, h=h: (bh // h, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, tile_q, dp),
                               lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B * h, Lp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_q, dp), jnp.float32),
            pltpu.VMEM((tile_q, 128), jnp.float32),
            pltpu.VMEM((tile_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, mask_i)
    out = out.reshape(B, h, Lp, dp).transpose(0, 2, 1, 3)
    return out[:, :L, :, :d]
