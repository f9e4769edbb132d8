"""lax.scan over decoder layers with stacked [L, ...] params + KV.

The compile-time backbone of the decode path: one executable holds a single
layer body (or one period of alternating layers) instead of num_layers
unrolled copies, cutting XLA compile time roughly num_layers-fold while the
runtime dataflow is identical.

KV-cache aliasing: the stacked cache rides in the scan *carry* and each
iteration updates its layer slice with dynamic_update_index_in_dim. XLA
keeps while-loop carries in place on donated buffers (measured: temp=0 for
the whole scan), whereas streaming the cache through scan xs/ys allocates a
second full-cache temp buffer (measured: temp == cache size) — that 2×
would OOM any serving-sized KV cache. Params are read-only and stream
through xs, which is free.

`period` handles interleaved architectures (Gemma2: sliding-window layers on
even indices, global on odd): the body applies `period` distinct layer
objects per scan step over leaf arrays reshaped to [L/period, period, ...].
"""

from typing import Any, Callable, List

import jax
import jax.numpy as jnp

from light_vllm_tpu import envs
from light_vllm_tpu.layers.base import StackedKernelRef

# Set True by the worker on tp>1 meshes: the Pallas stacked matmul is not
# GSPMD-partitionable, so sharded runs keep the XLA dynamic-slice path.
_INDEXED_DISABLED = False


def set_indexed_params_disabled(v: bool) -> None:
    global _INDEXED_DISABLED
    _INDEXED_DISABLED = bool(v)


def _indexed_enabled() -> bool:
    """Whether scan bodies hand linears StackedKernelRefs (Pallas stacked
    matmul) instead of XLA-sliced per-layer weights. XLA's HLO remat
    re-executes weight-stack slices inside the multi-step while loop
    (~5x the weight-read roofline, measured); the stacked kernel reads
    tiles straight from the stack."""
    if _INDEXED_DISABLED:
        return False
    v = envs.LVT_INDEXED_PARAMS
    if v == "auto":
        from light_vllm_tpu.platforms import current_platform

        return current_platform().is_tpu
    return bool(int(v))


def _is_stacked_kernel(path, leaf) -> bool:
    """Float/fp8/int8 [L, K, N] linear kernels and [L, E, K, N] MoE
    expert stacks — int4 keeps the slice path (its packed layout has no
    StackedKernelRef branch)."""
    if not hasattr(leaf, "ndim"):
        return False
    if leaf.dtype not in (jnp.bfloat16, jnp.float16, jnp.float32,
                          jnp.float8_e4m3fn, jnp.int8):
        return False
    last = path[-1]
    key = getattr(last, "key", None) or getattr(last, "name", None)
    if key == "kernel" and leaf.ndim == 3:
        from light_vllm_tpu.ops.stacked_matmul_pallas import \
            stacked_matmul_supported

        return stacked_matmul_supported(leaf.shape[1], leaf.shape[2])
    if key in ("w13", "w2") and leaf.ndim == 4 \
            and leaf.dtype != jnp.float8_e4m3fn:
        from light_vllm_tpu.ops.grouped_matmul import \
            stacked_grouped_supported

        return stacked_grouped_supported(leaf.shape[2], leaf.shape[3])
    return False


def _unroll(steps: int) -> int:
    """lax.scan unroll factor: divide evenly into steps where possible."""
    u = max(1, min(envs.LVT_SCAN_UNROLL, steps))
    while steps % u:
        u -= 1
    return u


def _group(tree: Any, period: int) -> Any:
    """Reshape each [L, ...] leaf to [L//period, period, ...] (free)."""
    return jax.tree.map(
        lambda a: a.reshape((a.shape[0] // period, period) + a.shape[1:]),
        tree)


def _slice(tree: Any, j: int) -> Any:
    return jax.tree.map(lambda a: a[j], tree)


def scan_decoder_layers(layers: List[Any], params_layers: Any, x, kv_caches,
                        call_fn: Callable, period: int = 1):
    """Run all decoder layers via lax.scan.

    layers: python layer objects; layers[0:period] define the body (all
        layers at index i ≡ j (mod period) must share layers[j]'s static
        config — window/soft-cap/shapes).
    params_layers: stacked param tree, every leaf [L, ...].
    kv_caches: stacked [L, slots, 2*kvh, d] array, passed WHOLE to
        call_fn with the layer index — the attention ops index it at
        (layer, slot) so the buffer is never sliced (a dynamic-slice
        feeding a pallas_call materializes a full per-layer copy each
        iteration; measured 360MB×28/step on the 1.5B bench model).
    call_fn(layer, p, x, kv_all, layer_idx) -> (x, kv_all).
    Returns (x, new_kv_caches [L, ...]).
    """
    L = kv_caches.shape[0]
    steps = L // period
    assert steps * period == L, (L, period)

    if _indexed_enabled():
        # Params do NOT stream through xs: the body closes over the whole
        # stacked tree; big matmul kernels become StackedKernelRefs (the
        # Pallas stacked matmul indexes the stack in place) and small
        # leaves (norm weights, biases, scales) are dynamic-indexed —
        # those copies are KBs.
        from jax import tree_util as jtu

        def make_pj(l):
            def pick(path, leaf):
                if _is_stacked_kernel(path, leaf):
                    return StackedKernelRef(leaf, l)
                return jax.lax.dynamic_index_in_dim(leaf, l, 0,
                                                    keepdims=False)
            return jtu.tree_map_with_path(pick, params_layers)

        def body(carry, step_idx):
            x, kv_all = carry
            for j in range(period):
                l = step_idx * period + j
                x, kv_all = call_fn(layers[j], make_pj(l), x, kv_all, l)
            return (x, kv_all), None

        (x, kv_caches), _ = jax.lax.scan(
            body, (x, kv_caches), jnp.arange(steps, dtype=jnp.int32),
            unroll=_unroll(steps))
        return x, kv_caches

    p_g = _group(params_layers, period) if period > 1 else params_layers

    def body(carry, xs):
        x, kv_all = carry
        step_idx, p_s = xs
        for j in range(period):
            l = step_idx * period + j
            p_j = _slice(p_s, j) if period > 1 else p_s
            x, kv_all = call_fn(layers[j], p_j, x, kv_all, l)
        return (x, kv_all), None

    (x, kv_caches), _ = jax.lax.scan(
        body, (x, kv_caches), (jnp.arange(steps, dtype=jnp.int32), p_g),
        unroll=_unroll(steps))
    return x, kv_caches


def scan_encode_layers(layers: List[Any], params_layers: Any, x,
                       call_fn: Callable, period: int = 1):
    """KV-less variant for the dense embedder path."""
    if period == 1:
        layer0 = layers[0]

        def body(x, p_l):
            return call_fn(layer0, p_l, x), None

        x, _ = jax.lax.scan(body, x, params_layers)
        return x

    p_g = _group(params_layers, period)

    def body(x, p_s):
        for j in range(period):
            x = call_fn(layers[j], _slice(p_s, j), x)
        return x, None

    x, _ = jax.lax.scan(body, x, p_g)
    return x
