"""Paged KV-cache write ops.

TPU-native replacement for the reference's cache kernels
(reference: csrc/cache_kernels.cu — reshape_and_cache_flash, copy_blocks,
swap_blocks). The cache layout is

    k_pages, v_pages : [num_kv_heads, num_pages * page_size, head_dim]

i.e. flat "slots" along axis 1, kv-head-major so TP shards axis 0 over the
mesh "tp" axis. A token's slot is block_number * page_size + block_offset —
the same slot-mapping contract the reference's scheduler builds
(reference: light_vllm/decoding/backends/attention/backends/utils.py).

Slot 0 .. page_size-1 (page 0) is reserved as a trash page: padded batch
entries write there, which keeps every scatter index in-bounds under jit.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def write_kv_to_pages(
    k_pages: jnp.ndarray,      # [kvh, num_slots, d]
    v_pages: jnp.ndarray,      # [kvh, num_slots, d]
    k: jnp.ndarray,            # [T, kvh, d] new keys
    v: jnp.ndarray,            # [T, kvh, d]
    slot_mapping: jnp.ndarray,  # [T] int32 flat slot per token
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter new K/V rows into the paged cache; returns updated caches.

    Under jit with donated cache buffers this lowers to an in-place scatter.
    Optional scales quantize into an fp8 cache (reference: convert_fp8 /
    Fp8KVCacheMethod, csrc/quantization/fp8).
    """
    cache_dtype = k_pages.dtype
    k_t = jnp.swapaxes(k, 0, 1)  # [kvh, T, d]
    v_t = jnp.swapaxes(v, 0, 1)
    if cache_dtype != k.dtype:
        if k_scale is not None:
            k_t = k_t / k_scale
            v_t = v_t / v_scale
        k_t = k_t.astype(cache_dtype)
        v_t = v_t.astype(cache_dtype)
    k_pages = k_pages.at[:, slot_mapping, :].set(
        k_t, mode="drop", unique_indices=False)
    v_pages = v_pages.at[:, slot_mapping, :].set(
        v_t, mode="drop", unique_indices=False)
    return k_pages, v_pages


def copy_pages(k_pages: jnp.ndarray, v_pages: jnp.ndarray,
               src_blocks: jnp.ndarray, dst_blocks: jnp.ndarray,
               page_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Copy-on-write block duplication (reference: copy_blocks,
    csrc/cache_kernels.cu). src/dst are [N] block numbers."""
    kvh, num_slots, d = k_pages.shape
    kp = k_pages.reshape(kvh, num_slots // page_size, page_size, d)
    vp = v_pages.reshape(kvh, num_slots // page_size, page_size, d)
    kp = kp.at[:, dst_blocks].set(kp[:, src_blocks], mode="drop")
    vp = vp.at[:, dst_blocks].set(vp[:, src_blocks], mode="drop")
    return kp.reshape(k_pages.shape), vp.reshape(v_pages.shape)


def gather_blocks(pages: jnp.ndarray, block_ids: jnp.ndarray,
                  page_size: int) -> jnp.ndarray:
    """Pull blocks out of the device cache (host swap-out path); returns
    [kvh, len(block_ids), page_size, d]."""
    kvh, num_slots, d = pages.shape
    p = pages.reshape(kvh, num_slots // page_size, page_size, d)
    return p[:, block_ids]


def scatter_blocks(pages: jnp.ndarray, blocks: jnp.ndarray,
                   block_ids: jnp.ndarray, page_size: int) -> jnp.ndarray:
    """Write host-swapped-in blocks back into the device cache."""
    kvh, num_slots, d = pages.shape
    p = pages.reshape(kvh, num_slots // page_size, page_size, d)
    p = p.at[:, block_ids].set(blocks, mode="drop")
    return p.reshape(pages.shape)
