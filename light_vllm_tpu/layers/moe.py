"""Fused Mixture-of-Experts layer (reference:
light_vllm/backends/fused_moe/layer.py:123 + fused_moe.py Triton kernel).

Routing: per-token top-k softmax over the router logits (reference:
csrc/moe/topk_softmax). Expert compute has two exact formulations, chosen
at trace time by token count:

  masked-dense — every expert runs on every token, combined by the sparse
    routing weights; jit-trivial, best for small decode batches where the
    grouped kernel's sort/tiling overhead dominates.
  grouped      — sort tokens by expert + Pallas grouped matmul
    (ops/grouped_matmul.py, megablocks-style); FLOPs ~ T*k instead of T*E,
    the win for prefill. Reference analog: the Triton fused-moe kernel
    (light_vllm/backends/fused_moe/fused_moe.py).

Expert weights are stacked [E, ...] and shard over the "tp" axis on the
expert dimension → expert parallelism falls out of GSPMD (masked-dense
path; the grouped kernel currently requires replicated experts).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.layers.activation import silu_and_mul
from light_vllm_tpu.layers.base import Layer, ParamSpec, Params


def topk_softmax(router_logits: jnp.ndarray, top_k: int,
                 renormalize: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[T, E] → (weights [T, k], ids [T, k])."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    weights, ids = jax.lax.top_k(probs, top_k)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


class FusedMoE(Layer):

    def __init__(self, num_experts: int, top_k: int, hidden_size: int,
                 intermediate_size: int, *, dtype=jnp.bfloat16,
                 renormalize: bool = True, ep_axis: Optional[str] = None
                 ) -> None:
        super().__init__()
        self.num_experts = num_experts
        self.top_k = top_k
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.renormalize = renormalize
        self.ep_axis = ep_axis
        E, H, I = num_experts, hidden_size, intermediate_size
        self._specs = {
            "router": ParamSpec((H, E), dtype, P()),
            # w13: fused gate+up per expert; w2: down projection
            "w13": ParamSpec((E, H, 2 * I), dtype, P(ep_axis)),
            "w2": ParamSpec((E, I, H), dtype, P(ep_axis)),
        }

    def _use_grouped(self, T: int) -> bool:
        from light_vllm_tpu import envs
        mode = envs.LVT_MOE_BACKEND
        if mode == "grouped":
            return True
        if mode == "dense":
            return False
        # auto: grouped pays off once the sorted token dim fills MXU tiles
        # and the expert axis is unsharded.
        from light_vllm_tpu.platforms import detect_platform
        return (detect_platform().is_tpu and self.ep_axis is None
                and T * self.top_k >= 256)

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """x [T, H] → [T, H]."""
        from light_vllm_tpu.layers.base import StackedKernelRef

        T, H = x.shape
        E, k = self.num_experts, self.top_k
        router_logits = jnp.dot(x, params["router"],
                                preferred_element_type=jnp.float32)
        weights, ids = topk_softmax(router_logits, k, self.renormalize)

        w13, w2 = params["w13"], params["w2"]
        stacked = isinstance(w13, StackedKernelRef)
        if stacked and self._use_grouped(T):
            # scan-over-layers: the stacked grouped kernel indexes the
            # [L, E, ...] expert stacks in place (no per-layer slice).
            from light_vllm_tpu.ops.grouped_matmul import moe_sorted_compute
            from light_vllm_tpu.platforms import current_platform
            return moe_sorted_compute(
                x, w13.stack, w2.stack, weights, ids, top_k=k,
                layer_idx=w13.layer_idx,
                interpret=not current_platform().is_tpu)
        if stacked:
            # masked-dense fallback needs materialized slices
            w13 = jax.lax.dynamic_index_in_dim(w13.stack, w13.layer_idx,
                                               0, keepdims=False)
            w2 = jax.lax.dynamic_index_in_dim(params["w2"].stack,
                                              params["w2"].layer_idx,
                                              0, keepdims=False)
        params = dict(params, w13=w13, w2=w2)

        if self._use_grouped(T):
            from light_vllm_tpu.ops.grouped_matmul import moe_sorted_compute
            from light_vllm_tpu.platforms import current_platform
            return moe_sorted_compute(x, params["w13"], params["w2"],
                                      weights, ids, top_k=k,
                                      use_pallas=True,
                                      interpret=not current_platform(
                                      ).is_tpu)

        # sparse [T, E] combine matrix
        combine = jnp.zeros((T, E), jnp.float32)
        combine = combine.at[jnp.arange(T)[:, None], ids].add(weights)

        # masked-dense expert compute: h_e = silu_and_mul(x @ w13_e) @ w2_e
        h = jnp.einsum("th,ehi->eti", x, params["w13"],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        h = silu_and_mul(h)
        y = jnp.einsum("eti,eih->eth", h, params["w2"],
                       preferred_element_type=jnp.float32)  # [E, T, H] f32
        out = jnp.einsum("te,eth->th", combine, y)
        return out.astype(x.dtype)
