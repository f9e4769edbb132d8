"""Pallas TPU in-place paged KV-cache writer.

TPU-native replacement for the reference's reshape_and_cache scatter
(reference: csrc/cache_kernels.cu reshape_and_cache_flash). The jnp
``cache.at[layer, slots].set(kv)`` scatter is correct, but under the
scan-over-layers step XLA lowers the (layer, slot)-indexed scatter into
full-cache fusions — profiled at ~12 ms per layer-group on a 10 GB
stacked cache (the entire cache rewritten at HBM bandwidth, with remat
duplicates). This kernel instead issues *direct HBM→HBM DMAs* for
exactly the rows being written (~1 KB/token) and aliases the cache
buffer in place (input_output_aliases), so a 2048-token chunk moves
2 MB instead of 10 GB.

Write plan (host-built for the outer step, traced for multi-step decode
iterations — see decoding/processor.py build of ``kv_write``):
    counts [2] i32   = (num_page_runs, num_row_writes)
    pages  [2, NP]   = (dst_slot_start; src_row_start) full-page runs
    rows   [2, NR]   = (dst_slot; src_row) single-token writes
(tables are [2, N], not [N, 2] — SMEM pads the minor dim to 128 words,
so a [N, 2] prefetch operand would occupy 64x its size)
Page runs cover tokens that fill an aligned page completely (the common
case in prefill: a 256-token prompt is 16 full pages); singles cover
decode tokens and chunk-boundary partial pages. Padded-row K/V is simply
never written (the jnp scatter needed a trash page to stay in-bounds;
DMAs don't).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kv_write_kernel(counts_ref, pages_ref, rows_ref, layer_ref,
                     kv_hbm, cache_in, cache_out, sem,
                     *, page_size: int):
    """Single-instance kernel: issue all DMAs, then drain the semaphore.

    cache_out aliases cache_in (same buffer); only cache_out is touched.
    """
    del cache_in
    layer = layer_ref[0]
    n_pages = counts_ref[0]
    n_rows = counts_ref[1]

    def page_copy(i):
        dst = pages_ref[0, i]
        src = pages_ref[1, i]
        return pltpu.make_async_copy(
            kv_hbm.at[pl.ds(src, page_size)],
            cache_out.at[layer, pl.ds(dst, page_size)], sem)

    def row_copy(i):
        dst = rows_ref[0, i]
        src = rows_ref[1, i]
        return pltpu.make_async_copy(
            kv_hbm.at[pl.ds(src, 1)],
            cache_out.at[layer, pl.ds(dst, 1)], sem)

    def start_pages(i, c):
        page_copy(i).start()
        return c

    def start_rows(i, c):
        row_copy(i).start()
        return c

    jax.lax.fori_loop(0, n_pages, start_pages, 0)
    jax.lax.fori_loop(0, n_rows, start_rows, 0)
    # Drain: wait() decrements the semaphore by each copy's byte count, so
    # reconstructing the same descriptors drains exactly what was issued.
    jax.lax.fori_loop(0, n_pages, lambda i, c: (page_copy(i).wait(), c)[1], 0)
    jax.lax.fori_loop(0, n_rows, lambda i, c: (row_copy(i).wait(), c)[1], 0)


@functools.partial(jax.jit,
                   static_argnames=("page_size", "interpret"))
def write_kv_pages_inplace(
    kv_pages: jnp.ndarray,   # [slots, 2*kvh, d] or stacked [L, slots, ...]
    kv: jnp.ndarray,         # [T, 2*kvh, d] interleaved rows, cache dtype
    counts: jnp.ndarray,     # [2] i32 (n_page_runs, n_row_writes)
    pages: jnp.ndarray,      # [2, NP] i32 (dst_slot_start; src_row_start)
    rows: jnp.ndarray,       # [2, NR] i32 (dst_slot; src_row)
    layer_idx=None,          # scalar i32 when kv_pages is stacked
    *,
    page_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Write this step's K/V rows into the paged cache, in place."""
    assert kv.dtype == kv_pages.dtype, (kv.dtype, kv_pages.dtype)
    if kv.shape[0] < page_size:
        # The page-run copy slices page_size source rows even when the
        # plan has zero page runs (trace-time shapes); tiny decode batches
        # just pad up.
        kv = jnp.pad(kv, ((0, page_size - kv.shape[0]), (0, 0), (0, 0)))
    stacked = kv_pages.ndim == 4
    cache4 = kv_pages if stacked else kv_pages[None]
    layer = (jnp.zeros((1,), jnp.int32) if layer_idx is None
             else jnp.asarray(layer_idx, jnp.int32).reshape(1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,   # counts, pages, rows, layer
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # kv rows
            pl.BlockSpec(memory_space=pl.ANY),  # cache (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        functools.partial(_kv_write_kernel, page_size=page_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache4.shape, cache4.dtype),
        # flattened input order: 4 prefetch args, kv, cache → cache is 5
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
        interpret=interpret,
    )(counts, pages, rows, layer, kv, cache4)
    return out if stacked else out[0]
