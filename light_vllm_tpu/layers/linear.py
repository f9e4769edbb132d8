"""Linear layer family with declarative TP sharding and pluggable quantization.

Counterpart of the reference's linear stack (reference:
light_vllm/backends/linear.py:84-810). The Column/Row distinction survives —
not as explicit collectives but as PartitionSpecs on the kernel:

  ColumnParallelLinear  kernel [in, out]  P(None, "tp")   (output sharded)
  RowParallelLinear     kernel [in, out]  P("tp", None)   (input sharded;
                        XLA inserts the psum the reference faked)

Kernels are stored [in_features, out_features] so the forward is
`x @ kernel` — the layout jnp/MXU favors; HF checkpoints ([out, in]) are
transposed at load time.
"""

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.layers.base import (Layer, ParamSpec, Params,
                                        StackedKernelRef)
from light_vllm_tpu.parallel.manual import manual_tp_axis, manual_tp_size


class LinearMethodBase:
    """Pluggable weight format + matmul (reference:
    light_vllm/backends/linear.py:84 LinearMethodBase)."""

    def create_specs(self, in_features: int, out_features: int, dtype,
                     kernel_pspec: P) -> Dict[str, ParamSpec]:
        raise NotImplementedError

    def apply(self, layer: "LinearBase", params: Params,
              x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


class UnquantizedLinearMethod(LinearMethodBase):

    def create_specs(self, in_features, out_features, dtype, kernel_pspec):
        return {"kernel": ParamSpec((in_features, out_features), dtype,
                                    kernel_pspec)}

    def apply(self, layer, params, x):
        kernel = params["kernel"]
        if isinstance(kernel, StackedKernelRef):
            from light_vllm_tpu.ops.stacked_matmul_pallas import \
                stacked_matmul
            from light_vllm_tpu.platforms import current_platform

            return stacked_matmul(x, kernel.stack, kernel.layer_idx,
                                  interpret=not current_platform().is_tpu)
        return jnp.dot(x, kernel, preferred_element_type=x.dtype)


class LinearBase(Layer):

    def __init__(self, in_features: int, out_features: int, *,
                 bias: bool = False, dtype=jnp.bfloat16,
                 kernel_pspec: P = P(), bias_pspec: P = P(),
                 quant_method: Optional[LinearMethodBase] = None) -> None:
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.has_bias = bias
        self.dtype = dtype
        self.quant_method = quant_method or UnquantizedLinearMethod()
        self._specs = self.quant_method.create_specs(
            in_features, out_features, dtype, kernel_pspec)
        if bias:
            self._specs["bias"] = ParamSpec((out_features,), dtype, bias_pspec)

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        y = self.quant_method.apply(self, params, x)
        if self.has_bias:
            y = y + params["bias"].astype(y.dtype)
        return y

    def maybe_quantize(self, raw: Params) -> Params:
        """Quantize a float host-side kernel at load time when this layer's
        specs expect a quantized format (reference:
        process_weights_after_loading, fp8.py:172-180). A kernel arriving as
        a QTensor / Fp8Tensor (prequantized GPTQ/AWQ/fp8 checkpoint,
        quant/ingest.py) is already in our layout — just splat its params."""
        if hasattr(raw.get("kernel"), "to_params"):
            qt = raw["kernel"]
            raw = dict(raw)
            raw.pop("kernel")
            raw.update(qt.to_params())
            # e4m3 checkpoint bits on a platform executing int8 (see
            # quant/fp8.py fp8_exec_mode): transcode to the method's
            # storage before placement.
            if hasattr(self.quant_method, "transcode_host"):
                raw = self.quant_method.transcode_host(raw)
            return raw
        if ("scale" in self._specs and "scale" not in raw
                and "kernel" in raw
                and hasattr(self.quant_method, "quantize_host")):
            qd = self.quant_method.quantize_host(raw["kernel"])
            raw = dict(raw)
            raw.pop("kernel")
            raw.update(qd)
        return raw


class ReplicatedLinear(LinearBase):
    """Weight replicated on every device (reference: linear.py:183)."""

    def __init__(self, in_features, out_features, *, bias=False,
                 dtype=jnp.bfloat16, quant_method=None):
        super().__init__(in_features, out_features, bias=bias, dtype=dtype,
                         kernel_pspec=P(), bias_pspec=P(),
                         quant_method=quant_method)


class ColumnParallelLinear(LinearBase):
    """Output-dimension sharded over the "tp" mesh axis
    (reference: linear.py:255)."""

    def __init__(self, in_features, out_features, *, bias=False,
                 dtype=jnp.bfloat16, quant_method=None, tp_axis="tp"):
        super().__init__(in_features, out_features, bias=bias, dtype=dtype,
                         kernel_pspec=P(None, tp_axis),
                         bias_pspec=P(tp_axis),
                         quant_method=quant_method)


class RowParallelLinear(LinearBase):
    """Input-dimension sharded; XLA adds the all-reduce under GSPMD. Under
    manual-TP (the whole-model shard_map of parallel/manual.py) the layer
    psums its per-shard partial product itself — the explicit collective
    the reference's RowParallelLinear issues over NCCL
    (reference: linear.py:698)."""

    def __init__(self, in_features, out_features, *, bias=False,
                 dtype=jnp.bfloat16, quant_method=None, tp_axis="tp"):
        super().__init__(in_features, out_features, bias=bias, dtype=dtype,
                         kernel_pspec=P(tp_axis, None),
                         bias_pspec=P(),
                         quant_method=quant_method)

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        y = self.quant_method.apply(self, params, x)
        if manual_tp_size() > 1:
            # partial product over the local input shard → sum over "tp";
            # bias is replicated so it is added once, after the psum.
            y = jax.lax.psum(y, manual_tp_axis())
        if self.has_bias:
            y = y + params["bias"].astype(y.dtype)
        return y


class MergedColumnParallelLinear(ColumnParallelLinear):
    """Several column-parallel projections fused into one kernel (e.g.
    gate+up; reference: linear.py:365). `output_sizes` records the split
    points for weight loading."""

    def __init__(self, in_features: int, output_sizes: Sequence[int], *,
                 bias=False, dtype=jnp.bfloat16, quant_method=None):
        super().__init__(in_features, int(sum(output_sizes)), bias=bias,
                         dtype=dtype, quant_method=quant_method)
        self.output_sizes = list(output_sizes)

    def shard_offset(self, idx: int) -> int:
        return int(sum(self.output_sizes[:idx]))

    # --- manual-TP column shuffle --------------------------------------------
    # Under the whole-model shard_map (parallel/manual.py), shard r sees
    # the contiguous column block [r*N/tp, (r+1)*N/tp) of the kernel. The
    # checkpoint layout is [sub0 | sub1 | ...] (e.g. q|k|v), so that block
    # would straddle sub-projection boundaries. Permuting columns at load
    # time to [sub0_r0 sub1_r0 ... | sub0_r1 sub1_r1 ...] makes every
    # shard's local block a miniature [sub0_r | sub1_r | ...] merged
    # kernel, and the local split points are simply output_sizes/tp —
    # the implicit layout of the reference's per-shard weight loading
    # (reference: linear.py:505 QKVParallelLinear weight_loader).

    def supports_manual_tp(self, tp: int) -> bool:
        return all(s % tp == 0 for s in self.output_sizes)

    def manual_tp_permutation(self, tp: int) -> np.ndarray:
        idx = []
        for r in range(tp):
            off = 0
            for s in self.output_sizes:
                per = s // tp
                idx.extend(range(off + r * per, off + (r + 1) * per))
                off += s
        return np.asarray(idx, np.int64)

    def shuffle_for_manual_tp(self, raw: Params, tp: int) -> Params:
        """Permute the out_features axis of every host-side param."""
        if tp <= 1:
            return raw
        perm = self.manual_tp_permutation(tp)
        N = self.out_features
        out = {}
        for name, arr in raw.items():
            a = np.asarray(arr)
            # the out_features axis is the last one of size N (kernel
            # [K, N], int4 scale/zero [ng, N]) or axis 0 for 1-D (bias,
            # per-channel scale [N])
            if a.ndim == 1 and a.shape[0] == N:
                a = a[perm]
            elif a.ndim >= 2 and a.shape[-1] == N:
                a = a[..., perm]
            out[name] = a
        return out


def gated_mlp_act(act_fn, gate_up: "MergedColumnParallelLinear",
                  params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """act(gate) * up for a merged gate_up projection — via the fused
    stacked gate_up kernel when the weights are layer-stacked (saves the
    [T, 2I] activation round trip to HBM: ~0.16 ms/layer of
    slice_multiply fusions at T=2048, I=8960), else the plain matmul +
    gated activation."""
    from light_vllm_tpu.layers.activation import gated_act_kernel_name
    from light_vllm_tpu.layers.base import StackedKernelRef

    act = gated_act_kernel_name(act_fn)
    kern = params.get("kernel")
    if act is not None and isinstance(kern, StackedKernelRef) \
            and not gate_up.has_bias:
        from light_vllm_tpu.ops.stacked_matmul_pallas import (
            stacked_matmul_gated, stacked_matmul_gated_supported,
            stacked_quantized_matmul_gated)
        from light_vllm_tpu.platforms import current_platform

        if stacked_matmul_gated_supported(
                kern.stack.shape[1], kern.stack.shape[2], act):
            interp = not current_platform().is_tpu
            scale = params.get("scale")
            if scale is not None and kern.stack.dtype != x.dtype:
                from light_vllm_tpu.layers.quant.fp8 import _hoist_min_m
                if x.shape[0] >= _hoist_min_m():
                    # big batches route through the hoisted-dequant XLA
                    # path (see quant/fp8.py apply) — faster than any
                    # inline-dequant Mosaic kernel, fused or not
                    return act_fn(gate_up(params, x))
                return stacked_quantized_matmul_gated(
                    x, kern.stack, scale, kern.layer_idx, act=act,
                    interpret=interp)
            if scale is None and kern.stack.dtype == x.dtype:
                return stacked_matmul_gated(x, kern.stack, kern.layer_idx,
                                            act=act, interpret=interp)
    return act_fn(gate_up(params, x))


class QKVParallelLinear(MergedColumnParallelLinear):
    """Fused QKV projection, sharded on the head dimension
    (reference: linear.py:505)."""

    def __init__(self, hidden_size: int, head_dim: int, num_heads: int,
                 num_kv_heads: int, *, bias=False, dtype=jnp.bfloat16,
                 quant_method=None):
        self.hidden_size = hidden_size
        self.head_dim = head_dim
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        q = num_heads * head_dim
        kv = num_kv_heads * head_dim
        super().__init__(hidden_size, [q, kv, kv], bias=bias, dtype=dtype,
                         quant_method=quant_method)

    def split_qkv(self, qkv: jnp.ndarray):
        # Under manual-TP the projection output is the local shard
        # [q_r | k_r | v_r] (columns shuffled at load — see
        # shuffle_for_manual_tp), so the split points are the LOCAL sizes.
        tp = manual_tp_size()
        q_size = self.num_heads * self.head_dim // tp
        kv_size = self.num_kv_heads * self.head_dim // tp
        q = qkv[..., :q_size]
        k = qkv[..., q_size:q_size + kv_size]
        v = qkv[..., q_size + kv_size:]
        return q, k, v
