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
                       interpret: bool = False) -> jnp.ndarray:
    """Sparse MoE FFN via sort-by-expert + grouped matmuls.

    x [T, H]; w13 [E, H, 2I]; w2 [E, I, H]; weights/ids [T, k] from
    topk_softmax. FLOPs are proportional to T*k (vs T*E for masked-dense).
    """
    from light_vllm_tpu.layers.activation import silu_and_mul

    T, H = x.shape
    E = w13.shape[0]
    flat_ids = ids.reshape(-1)                       # [T*k]
    sort_idx = jnp.argsort(flat_ids)                 # stable
    tok_idx = sort_idx // top_k
    x_sorted = jnp.take(x, tok_idx, axis=0)          # [T*k, H]
    group_sizes = jnp.bincount(flat_ids, length=E).astype(jnp.int32)

    h = grouped_matmul(x_sorted, w13, group_sizes, use_pallas=use_pallas,
                       interpret=interpret).astype(x.dtype)
    h = silu_and_mul(h)
    y = grouped_matmul(h, w2, group_sizes, use_pallas=use_pallas,
                       interpret=interpret)          # [T*k, H] f32

    w_sorted = jnp.take(weights.reshape(-1), sort_idx)
    out = jnp.zeros((T, H), jnp.float32)
    out = out.at[tok_idx].add(y.astype(jnp.float32) * w_sorted[:, None])
    return out.astype(x.dtype)
