"""Grouped (megablocks-style) matmul for MoE expert compute.

TPU-native replacement for the reference's Triton fused-moe kernel
(reference: light_vllm/backends/fused_moe/fused_moe.py — invoke_fused_moe_kernel
aligns token blocks to experts; csrc/moe_align_block_size_kernels.cu). On TPU
the equivalent primitive is the Pallas gmm ("grouped matrix multiply") that
ships with jax (jax.experimental.pallas.ops.tpu.megablox): tokens sorted by
expert id, a per-expert row-count vector, and one kernel that walks tiles of
the sorted token dim against each expert's weight block on the MXU.

    lhs [m, K] (rows sorted by group) · rhs [G, K, N], group_sizes [G]
        → out [m, N]   where out[i] = lhs[i] @ rhs[group_of(i)]
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_vllm_tpu.ops.stacked_matmul_pallas import _pick_tile
from light_vllm_tpu.utils import cdiv

GROUP_TILE_M = 128  # sorted-token tile; groups are padded to multiples


def stacked_grouped_supported(K: int, N: int) -> bool:
    return _pick_tile(K, 2048, 256) is not None and \
        _pick_tile(N, 1024, 256) is not None


def _sgmm_kernel(tile_expert_ref, layer_ref, x_ref, w_ref, o_ref, acc_ref,
                 *, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stacked_grouped_matmul(
    lhs: jnp.ndarray,          # [M_pad, K], rows grouped by expert,
                               # each group's rows tile-aligned
    w_stack: jnp.ndarray,      # [L, E, K, N]
    tile_expert: jnp.ndarray,  # [M_pad // GROUP_TILE_M] i32
    layer_idx,                 # scalar i32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i] = lhs[i] @ w_stack[layer_idx, expert_of_tile(i)].

    The stacked-expert twin of stacked_matmul: expert AND layer are
    picked per-tile via scalar-prefetched index maps, so scan-over-layers
    MoE models never materialize a per-layer expert-stack slice (the
    megablox gmm has no layer dim — slicing [L, E, K, N] per scan
    iteration is the same HLO-remat hazard the dense stacks had)."""
    M, K = lhs.shape
    L, E, K2, N = w_stack.shape
    assert K == K2 and M % GROUP_TILE_M == 0, (lhs.shape, w_stack.shape)
    kt = _pick_tile(K, 2048, 256)
    nt = _pick_tile(N, 1024, 256)
    assert kt is not None and nt is not None, (K, N)
    nk = K // kt
    layer_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(M // GROUP_TILE_M, N // nt, nk),
        in_specs=[
            pl.BlockSpec((GROUP_TILE_M, kt), lambda m, n, k, te, l: (m, k)),
            pl.BlockSpec((1, 1, kt, nt),
                         lambda m, n, k, te, l: (l[0], te[m], k, n)),
        ],
        out_specs=pl.BlockSpec((GROUP_TILE_M, nt),
                               lambda m, n, k, te, l: (m, n)),
        scratch_shapes=[pltpu.VMEM((GROUP_TILE_M, nt), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_sgmm_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), lhs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary")),
        interpret=interpret,
    )(tile_expert, layer_arr, lhs, w_stack)


def _reference_grouped_matmul(lhs: jnp.ndarray, rhs: jnp.ndarray,
                              group_sizes: jnp.ndarray) -> jnp.ndarray:
    """lax.ragged_dot — exact, runs on any backend (test/CPU path)."""
    return jax.lax.ragged_dot(lhs, rhs, group_sizes)


def grouped_matmul(lhs: jnp.ndarray, rhs: jnp.ndarray,
                   group_sizes: jnp.ndarray, *,
                   use_pallas: bool = False,
                   interpret: bool = False) -> jnp.ndarray:
    """out[i] = lhs[i] @ rhs[g(i)] with lhs rows sorted by group.

    `use_pallas` selects the megablox Pallas kernel (TPU; `interpret=True`
    emulates it elsewhere for tests). Rows beyond sum(group_sizes) produce
    zeros in the Pallas path and garbage in none — callers mask anyway.
    """
    if not use_pallas:
        return _reference_grouped_matmul(lhs, rhs, group_sizes)
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    m, k = lhs.shape
    _, _, n = rhs.shape
    tiling = (min(512, m), min(512, k), min(512, n))
    return gmm(lhs, rhs, group_sizes.astype(jnp.int32), tiling=tiling,
               preferred_element_type=jnp.float32, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("top_k", "use_pallas",
                                             "interpret"))
def moe_sorted_compute(x: jnp.ndarray, w13: jnp.ndarray, w2: jnp.ndarray,
                       weights: jnp.ndarray, ids: jnp.ndarray, *,
                       top_k: int, use_pallas: bool = False,
                       layer_idx=None,
                       interpret: bool = False) -> jnp.ndarray:
    """Sparse MoE FFN via sort-by-expert + grouped matmuls.

    x [T, H]; w13 [E, H, 2I]; w2 [E, I, H]; weights/ids [T, k] from
    topk_softmax. FLOPs are proportional to T*k (vs T*E for masked-dense).

    With layer_idx, w13/w2 are layer-STACKED ([L, E, ...]) and the
    stacked grouped kernel indexes them in place (scan-over-layers)."""
    from light_vllm_tpu.layers.activation import silu_and_mul

    T, H = x.shape
    E = w13.shape[1] if layer_idx is not None else w13.shape[0]
    flat_ids = ids.reshape(-1)                       # [T*k]
    sort_idx = jnp.argsort(flat_ids)                 # stable
    tok_idx = sort_idx // top_k
    x_sorted = jnp.take(x, tok_idx, axis=0)          # [T*k, H]
    group_sizes = jnp.bincount(flat_ids, length=E).astype(jnp.int32)

    if layer_idx is not None:
        mt = GROUP_TILE_M
        M = T * top_k
        # Tile-align each expert's run so every m-tile maps to exactly
        # one expert (the megablocks / moe_align_block_size trick —
        # reference: csrc/moe_align_block_size_kernels.cu).
        padded = cdiv(group_sizes, mt) * mt          # [E]
        astart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(padded)[:-1].astype(jnp.int32)])
        gstart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(group_sizes)[:-1
                                                          ].astype(jnp.int32)])
        rank = jnp.arange(M, dtype=jnp.int32) - gstart[flat_ids[sort_idx]]
        dest = astart[flat_ids[sort_idx]] + rank     # [M]
        M_pad = cdiv(M + E * (mt - 1), mt) * mt      # static upper bound
        x_al = jnp.zeros((M_pad, H), x.dtype).at[dest].set(x_sorted)
        tiles = jnp.arange(M_pad // mt, dtype=jnp.int32)
        tile_expert = jnp.clip(
            jnp.sum(tiles[:, None] * mt >= astart[None, :], axis=1) - 1,
            0, E - 1).astype(jnp.int32)

        h = stacked_grouped_matmul(x_al, w13, tile_expert, layer_idx,
                                   interpret=interpret).astype(x.dtype)
        h = silu_and_mul(h)
        y_al = stacked_grouped_matmul(h, w2, tile_expert, layer_idx,
                                      interpret=interpret)
        y = y_al[dest]                                # [M, H]
    else:
        h = grouped_matmul(x_sorted, w13, group_sizes,
                           use_pallas=use_pallas,
                           interpret=interpret).astype(x.dtype)
        h = silu_and_mul(h)
        y = grouped_matmul(h, w2, group_sizes, use_pallas=use_pallas,
                           interpret=interpret)      # [T*k, H] f32

    w_sorted = jnp.take(weights.reshape(-1), sort_idx)
    out = jnp.zeros((T, H), jnp.float32)
    out = out.at[tok_idx].add(y.astype(jnp.float32) * w_sorted[:, None])
    return out.astype(x.dtype)
