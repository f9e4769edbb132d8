"""Decoding attention backend: paged KV cache + ragged batch attention.

Counterpart of the reference's flash-attn backend bundle (reference:
light_vllm/decoding/backends/attention/backends/flash_attn.py:20-571 and
ops/paged_attn.py): one backend object bundles the KV-cache shape contract,
the cache-write op, and the attention computation over a ragged
prefill+decode batch.

Two impls:
  - ReferencePagedAttnBackend: pure-jnp (CPU tests / fallback)
  - PallasPagedAttnBackend: Pallas ragged paged-attention kernel (TPU)
"""

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax.numpy as jnp

from light_vllm_tpu import envs
from light_vllm_tpu.layers.base import Layer, ParamSpec
from light_vllm_tpu.logger import init_logger
from light_vllm_tpu.ops.attention_ref import ragged_paged_attention_ref
from light_vllm_tpu.ops.kv_cache import write_kv_to_pages
from light_vllm_tpu.platforms import current_platform

logger = init_logger(__name__)


@dataclass
class DecodeAttnMetadata:
    """Attention metadata: device arrays + static layout ints (the ints are
    trace-time constants — part of the jit cache key, not traced)."""

    slot_mapping: Any       # [T] i32
    block_tables: Any       # [S, max_pages] i32
    seq_lens: Any           # [S] i32
    seq_ids: Any            # [T] i32 token → seq slot
    positions: Any          # [T] i32
    ctx_lens: Any = None    # [S] i32
    chunk_starts: Any = None  # [S] i32
    chunk_lens: Any = None  # [S] i32
    tile_seq: Any = None    # [NT] i32
    tile_qstart: Any = None  # [NT] i32
    num_seqs: Any = None    # [] i32
    # KV write plan for the in-place Pallas cache writer (see
    # ops/kv_write_pallas.py): (counts [2], pages [2, NP], rows [2, NR]).
    # None → backends fall back to the jnp scatter.
    write_counts: Any = None
    write_pages: Any = None
    write_rows: Any = None
    # static:
    num_decode_tokens: int = 0
    decode_region: int = 0
    num_prefill_seqs: int = 0


class PagedAttnBackend:
    name = "reference"

    def __init__(self, block_size: int, num_kv_heads: int, head_dim: int,
                 cache_dtype=None) -> None:
        self.block_size = block_size
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.cache_dtype = cache_dtype

    @classmethod
    def from_engine(cls, engine):
        cc = engine.engine_config.cache_config
        mc = engine.engine_config.model_config
        return get_decode_attn_backend(
            block_size=cc.block_size,
            num_kv_heads=mc.get_num_kv_heads(),
            head_dim=mc.get_head_size(),
            cache_dtype=cc.cache_jnp_dtype)

    # Set by the worker when running under a device mesh; the Pallas
    # backend uses it to shard_map the kernels over the "tp" axis.
    mesh = None
    # Whether attention() must run under shard_map on a tp>1 mesh
    # (pallas_call is not GSPMD-partitionable; the jnp reference impl is).
    shard_attention = False

    # --- cache contract -----------------------------------------------------
    def kv_cache_shape(self, num_blocks: int) -> Tuple[int, ...]:
        """[num_slots, 2*kvh, head_dim] (K/V rows interleaved per head);
        axis 1 shards over "tp" — the interleaving keeps each head's K and
        V on the same shard (ops/kv_cache.py)."""
        return (num_blocks * self.block_size, 2 * self.num_kv_heads,
                self.head_dim)

    def new_kv_cache(self, num_blocks: int, dtype):
        dt = self.cache_dtype or dtype
        return jnp.zeros(self.kv_cache_shape(num_blocks), dt)

    @property
    def needs_kv_scales(self) -> bool:
        """fp8 KV caches carry per-layer k/v dequant scales (reference:
        backends/quantization/kv_cache.py:8-77 Fp8KVCacheMethod)."""
        return self.cache_dtype is not None and \
            jnp.dtype(self.cache_dtype).itemsize == 1

    # --- ops ------------------------------------------------------------------
    def write_kv(self, kv_pages, k, v, meta: DecodeAttnMetadata,
                 layer_idx=None, k_scale=None, v_scale=None):
        return write_kv_to_pages(kv_pages, k, v, meta.slot_mapping,
                                 k_scale=k_scale, v_scale=v_scale,
                                 layer_idx=layer_idx)

    def attention(self, q, kv_pages, meta: DecodeAttnMetadata, *,
                  scale: float, sliding_window: Optional[int] = None,
                  logits_soft_cap: Optional[float] = None,
                  layer_idx=None):
        """q: [T, h, d] → [T, h, d]. kv_pages may be the full stacked
        [L, slots, 2*kvh, d] cache with layer_idx selecting the layer
        (scan-over-layers path)."""
        return ragged_paged_attention_ref(
            q, kv_pages.astype(q.dtype),
            meta.block_tables, meta.seq_lens, meta.seq_ids, meta.positions,
            self.block_size, scale=scale, sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap, layer_idx=layer_idx)


class PallasPagedAttnBackend(PagedAttnBackend):
    name = "pallas"
    # pallas_call is opaque to GSPMD: on a tp>1 mesh the Attention layer
    # runs this backend inside shard_map over "tp" (heads axis), where
    # each shard computes attention for its local kv-head slice with zero
    # cross-chip KV traffic (the psum stays in the o-projection).
    shard_attention = True

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        # Interpret mode runs the kernels as jax ops — CPU-mesh tests.
        self.interpret = not current_platform().is_tpu

    def write_kv(self, kv_pages, k, v, meta: DecodeAttnMetadata,
                 layer_idx=None, k_scale=None, v_scale=None):
        """In-place DMA cache writer: the jnp (layer, slot) scatter lowers
        to full-cache rewrite fusions under scan-over-layers (~12 ms per
        layer group on a 10 GB cache); the Pallas kernel moves only the
        written rows (ops/kv_write_pallas.py)."""
        if meta.write_counts is None:
            return super().write_kv(kv_pages, k, v, meta,
                                    layer_idx=layer_idx,
                                    k_scale=k_scale, v_scale=v_scale)
        from light_vllm_tpu.ops.kv_write_pallas import write_kv_pages_inplace

        cache_dtype = kv_pages.dtype
        if cache_dtype != k.dtype:
            if k_scale is not None:
                k = k / k_scale
                v = v / v_scale
            k = k.astype(cache_dtype)
            v = v.astype(cache_dtype)
        T, kvh, d = k.shape
        kv = jnp.stack([k, v], axis=2).reshape(T, 2 * kvh, d)
        return write_kv_pages_inplace(
            kv_pages, kv, meta.write_counts, meta.write_pages,
            meta.write_rows, layer_idx, page_size=self.block_size,
            interpret=self.interpret)

    def attention(self, q, kv_pages, meta: DecodeAttnMetadata, *,
                  scale: float, sliding_window: Optional[int] = None,
                  logits_soft_cap: Optional[float] = None,
                  layer_idx=None):
        if self.head_dim % 128 != 0 and self.head_dim != 64 \
                and not self.interpret:
            # head_dim 64 runs lane-packed (see ops/paged_attention_pallas
            # packed mode); other sub-128 dims (80/96) fall back to jnp.
            # fires once per executable build (trace-time only)
            logger.warning(
                "head_dim %d has no Pallas kernel; using the jnp "
                "reference attention (slower)", self.head_dim)
            return super().attention(
                q, kv_pages, meta, scale=scale,
                sliding_window=sliding_window,
                logits_soft_cap=logits_soft_cap, layer_idx=layer_idx)

        import jax.numpy as jnp

        from light_vllm_tpu.ops.paged_attention_pallas import \
            paged_attention_decode
        from light_vllm_tpu.ops.prefill_attention_pallas import \
            prefill_paged_attention

        D = meta.decode_region
        out_parts = []
        if D > 0:
            out_d = paged_attention_decode(
                q[:D], kv_pages, meta.block_tables[:D],
                meta.seq_lens[:D], page_size=self.block_size, scale=scale,
                sliding_window=sliding_window, soft_cap=logits_soft_cap,
                layer_idx=layer_idx, interpret=self.interpret)
            out_parts.append(out_d)
        if meta.num_prefill_seqs > 0:
            out_p = prefill_paged_attention(
                q, kv_pages, meta.tile_seq, meta.tile_qstart,
                meta.block_tables, meta.seq_lens, meta.ctx_lens,
                meta.chunk_starts, page_size=self.block_size, scale=scale,
                sliding_window=sliding_window, soft_cap=logits_soft_cap,
                layer_idx=layer_idx, interpret=self.interpret)
            out_parts.append(out_p[D:])
        if not out_parts:
            return jnp.zeros_like(q)
        if len(out_parts) == 1 and D > 0 and meta.num_prefill_seqs == 0 \
                and D < q.shape[0]:
            out_parts.append(jnp.zeros_like(q[D:]))
        return jnp.concatenate(out_parts, axis=0) \
            if len(out_parts) > 1 else out_parts[0]


def get_decode_attn_backend(**kwargs) -> PagedAttnBackend:
    choice = envs.LVT_ATTENTION_BACKEND
    if choice is None:
        choice = "pallas" if current_platform().is_tpu else "reference"
    if choice == "pallas":
        return PallasPagedAttnBackend(**kwargs)
    return PagedAttnBackend(**kwargs)


class KVScales(Layer):
    """Per-layer fp8-KV dequant scales as model params ([] f32, default 1;
    loaded from quantized checkpoints' k_scale/v_scale tensors — reference:
    core/loader/weight_utils.py:411-450 kv_cache_scales_loader +
    backends/quantization/kv_cache.py Fp8KVCacheMethod). Living in the
    param tree means they stack to [L] under scan-over-layers and trace
    through shard_map like any other weight."""

    def __init__(self) -> None:
        super().__init__()

        def ones(key, shape, dtype):
            return jnp.ones(shape, dtype)

        self._specs = {"k_scale": ParamSpec((), jnp.float32, init=ones),
                       "v_scale": ParamSpec((), jnp.float32, init=ones)}


class Attention:
    """Per-layer attention module for causal LMs (reference:
    light_vllm/backends/attention/layer.py:14). Holds no params; writes this
    step's K/V into the paged cache then runs the backend's ragged attention.
    """

    def __init__(self, num_heads: int, head_dim: int, num_kv_heads: int,
                 scale: float, backend: PagedAttnBackend,
                 sliding_window: Optional[int] = None,
                 logits_soft_cap: Optional[float] = None) -> None:
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.num_kv_heads = num_kv_heads
        self.scale = scale
        self.backend = backend
        self.sliding_window = sliding_window
        self.logits_soft_cap = logits_soft_cap

    def __call__(self, q, k, v, kv_cache, meta: DecodeAttnMetadata,
                 layer_idx=None, scales=None):
        """q [T, h*d], k/v [T, kvh*d]; kv_cache [slots, 2*kvh, d], or the
        full stacked [L, slots, 2*kvh, d] cache + layer_idx (scan path —
        the cache is never sliced, so it aliases in place in the scan
        carry). scales: optional {"k_scale","v_scale"} f32 scalars for an
        fp8 cache. Returns (out [T, h*d], new_kv_cache)."""
        from light_vllm_tpu.parallel.manual import manual_tp_size

        T = q.shape[0]
        # Under manual-TP (whole-model shard_map, parallel/manual.py) this
        # traces per-shard: q/k/v carry only the LOCAL heads and kv_cache
        # is the local kv-head slice, so no nested shard_map is needed.
        mtp = manual_tp_size()
        n_heads = self.num_heads // mtp
        n_kv = self.num_kv_heads // mtp
        qh = q.reshape(T, n_heads, self.head_dim)
        kh = k.reshape(T, n_kv, self.head_dim)
        vh = v.reshape(T, n_kv, self.head_dim)
        k_s = v_s = None
        if scales is not None:
            # Exact fp8-KV dequant without touching the kernels: the cache
            # holds k/k_s and v/v_s, so pre-scaling q by k_s recovers
            # q·kᵀ inside the kernel, and scaling the output by v_s
            # recovers v's magnitude (softmax weights are unaffected).
            # (reference: Fp8KVCacheMethod k_scale/v_scale semantics,
            # backends/quantization/kv_cache.py:8-77)
            k_s = scales["k_scale"].astype(jnp.float32)
            v_s = scales["v_scale"].astype(jnp.float32)
            qh = (qh.astype(jnp.float32) * k_s).astype(q.dtype)
        mesh = self.backend.mesh
        if mtp == 1 and self.backend.shard_attention and mesh is not None \
                and mesh.shape.get("tp", 1) > 1:
            out, kv_cache = self._sharded_call(qh, kh, vh, kv_cache, meta,
                                               mesh, layer_idx, k_s, v_s)
        else:
            kv_cache = self.backend.write_kv(kv_cache, kh, vh, meta,
                                             layer_idx=layer_idx,
                                             k_scale=k_s, v_scale=v_s)
            out = self.backend.attention(
                qh, kv_cache, meta, scale=self.scale,
                sliding_window=self.sliding_window,
                logits_soft_cap=self.logits_soft_cap,
                layer_idx=layer_idx)
        if v_s is not None:
            out = (out.astype(jnp.float32) * v_s).astype(q.dtype)
        return out.reshape(T, n_heads * self.head_dim), kv_cache

    def _sharded_call(self, qh, kh, vh, kv_cache, meta: DecodeAttnMetadata,
                      mesh, layer_idx=None, k_s=None, v_s=None):
        """Run write_kv + attention inside shard_map over the "tp" axis.

        pallas_call is opaque to GSPMD, so on a tp>1 mesh the kernel must
        be partitioned manually: heads axis 1 of q/k/v and of the
        (per-head-interleaved) KV cache shard over "tp"; every shard runs
        the kernel on its local kv-head slice. Attention is embarrassingly
        parallel over heads — the output stays head-sharded and the psum
        happens in the o-projection, exactly the partitioning the
        reference's TP-shaped layers encode (reference:
        light_vllm/backends/linear.py RowParallelLinear).
        """
        import dataclasses

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        arr_fields = [
            f.name for f in dataclasses.fields(meta)
            if f.name not in ("num_decode_tokens", "decode_region",
                              "num_prefill_seqs")
            and getattr(meta, f.name) is not None
        ]
        arrs = [getattr(meta, f) for f in arr_fields]
        heads = P(None, "tp", None)
        # stacked cache carries a leading layer axis
        stacked = layer_idx is not None
        kv_spec = P(None, None, "tp", None) if stacked else heads
        if stacked:
            arrs = [jnp.asarray(layer_idx, jnp.int32)] + arrs

        has_scales = k_s is not None
        if has_scales:
            arrs = [k_s, v_s] + arrs

        def inner(qh, kh, vh, kv_cache, *arrs):
            ks = vs = None
            if has_scales:
                ks, vs, arrs = arrs[0], arrs[1], arrs[2:]
            if stacked:
                l, arrs = arrs[0], arrs[1:]
            else:
                l = None
            m = dataclasses.replace(meta, **dict(zip(arr_fields, arrs)))
            kv_cache = self.backend.write_kv(kv_cache, kh, vh, m,
                                             layer_idx=l,
                                             k_scale=ks, v_scale=vs)
            out = self.backend.attention(
                qh, kv_cache, m, scale=self.scale,
                sliding_window=self.sliding_window,
                logits_soft_cap=self.logits_soft_cap, layer_idx=l)
            return out, kv_cache

        fn = shard_map(
            inner, mesh=mesh,
            in_specs=(heads, heads, heads, kv_spec) + (P(),) * len(arrs),
            out_specs=(heads, kv_spec),
            check_vma=False)
        return fn(qh, kh, vh, kv_cache, *arrs)
