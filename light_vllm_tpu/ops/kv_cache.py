"""Paged KV-cache write ops.

TPU-native replacement for the reference's cache kernels
(reference: csrc/cache_kernels.cu — reshape_and_cache_flash, copy_blocks,
swap_blocks). The cache layout is

    kv_pages : [num_pages * page_size, 2 * num_kv_heads, head_dim]

i.e. flat "slots" along axis 0, each slot holding that token's K/V rows
*interleaved per head* (row 2j = K of kv head j, row 2j+1 = V of kv head
j) — one buffer, one scatter, one DMA stream per page — the layout XLA's
TPU scatter prefers (slots major), so page writes alias in place on
donated buffers with no relayout copies. The interleaving is what makes
axis 1 blockwise-shardable over the mesh "tp" axis: each shard holds the
contiguous (K_j, V_j) pairs of its local kv heads, so the Pallas kernels
run shard-locally under shard_map with no cross-chip KV traffic. A token's slot is
block_number * page_size + block_offset — the same slot-mapping contract the
reference's scheduler builds (reference:
light_vllm/decoding/backends/attention/backends/utils.py).

Slot 0 .. page_size-1 (page 0) is reserved as a trash page: padded batch
entries write there, which keeps every scatter index in-bounds under jit.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def write_kv_to_pages(
    kv_pages: jnp.ndarray,     # [num_slots, 2*kvh, d] (K/V interleaved)
    k: jnp.ndarray,            # [T, kvh, d] new keys
    v: jnp.ndarray,            # [T, kvh, d]
    slot_mapping: jnp.ndarray,  # [T] int32 flat slot per token
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    layer_idx: Optional[jnp.ndarray] = None,  # scalar; kv_pages [L, ...]
) -> jnp.ndarray:
    """Scatter new K/V rows into the combined paged cache; returns the
    updated cache.

    Under jit with a donated cache buffer this lowers to an in-place scatter.
    Optional scales quantize into an fp8 cache (reference: convert_fp8 /
    Fp8KVCacheMethod, csrc/quantization/fp8).
    """
    cache_dtype = kv_pages.dtype
    if cache_dtype != k.dtype:
        if k_scale is not None:
            k = k / k_scale
            v = v / v_scale
        k = k.astype(cache_dtype)
        v = v.astype(cache_dtype)
    T, kvh, d = k.shape
    # Interleave per head: [T, kvh, 2, d] → [T, 2*kvh, d] (K_j at 2j,
    # V_j at 2j+1) — tiny.
    kv = jnp.stack([k, v], axis=2).reshape(T, 2 * kvh, d)
    if layer_idx is not None:
        # Stacked [L, slots, 2*kvh, d] cache (scan-over-layers): scatter
        # directly at (layer, slot) so the full stacked buffer stays
        # aliased in place inside the scan carry — slicing a layer out
        # first would materialize a per-layer copy every iteration.
        return kv_pages.at[layer_idx, slot_mapping].set(
            kv, mode="drop", unique_indices=False)
    return kv_pages.at[slot_mapping].set(kv, mode="drop",
                                         unique_indices=False)


def copy_pages_stacked(kv: jnp.ndarray,
                       src_blocks: jnp.ndarray, dst_blocks: jnp.ndarray,
                       page_size: int) -> jnp.ndarray:
    """copy_pages over a stacked [L, slots, 2*kvh, d] cache — all layers in
    one gather/scatter (scan-over-layers cache layout)."""
    L, num_slots, kvh2, d = kv.shape
    p = kv.reshape(L, num_slots // page_size, page_size, kvh2, d)
    p = p.at[:, dst_blocks].set(p[:, src_blocks], mode="drop")
    return p.reshape(kv.shape)


def gather_blocks_stacked(kv: jnp.ndarray, block_ids: jnp.ndarray,
                          page_size: int) -> jnp.ndarray:
    """[L, slots, 2*kvh, d] cache → [L, N, page_size, 2*kvh, d] blocks for
    host swap-out; one device op for every layer."""
    L, num_slots, kvh2, d = kv.shape
    p = kv.reshape(L, num_slots // page_size, page_size, kvh2, d)
    return p[:, block_ids]


def scatter_blocks_stacked(kv: jnp.ndarray, blocks: jnp.ndarray,
                           block_ids: jnp.ndarray,
                           page_size: int) -> jnp.ndarray:
    """Write [L, N, page_size, 2*kvh, d] swapped-in blocks back."""
    L, num_slots, kvh2, d = kv.shape
    p = kv.reshape(L, num_slots // page_size, page_size, kvh2, d)
    p = p.at[:, block_ids].set(blocks, mode="drop")
    return p.reshape(kv.shape)


def copy_pages(kv_pages: jnp.ndarray,
               src_blocks: jnp.ndarray, dst_blocks: jnp.ndarray,
               page_size: int) -> jnp.ndarray:
    """Copy-on-write block duplication (reference: copy_blocks,
    csrc/cache_kernels.cu). src/dst are [N] block numbers."""
    num_slots, kvh2, d = kv_pages.shape
    p = kv_pages.reshape(num_slots // page_size, page_size, kvh2, d)
    p = p.at[dst_blocks].set(p[src_blocks], mode="drop")
    return p.reshape(kv_pages.shape)


def gather_blocks(pages: jnp.ndarray, block_ids: jnp.ndarray,
                  page_size: int) -> jnp.ndarray:
    """Pull blocks out of the device cache (host swap-out path); returns
    [len(block_ids), page_size, 2*kvh, d]."""
    num_slots, kvh2, d = pages.shape
    p = pages.reshape(num_slots // page_size, page_size, kvh2, d)
    return p[block_ids]


def scatter_blocks(pages: jnp.ndarray, blocks: jnp.ndarray,
                   block_ids: jnp.ndarray, page_size: int) -> jnp.ndarray:
    """Write host-swapped-in blocks back into the device cache."""
    num_slots, kvh2, d = pages.shape
    p = pages.reshape(num_slots // page_size, page_size, kvh2, d)
    p = p.at[block_ids].set(blocks, mode="drop")
    return p.reshape(pages.shape)
