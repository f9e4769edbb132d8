"""INT8 W8A8 quantization (reference: csrc/quantization/cutlass_w8a8 +
compressed-tensors int8 path).

Weights: per-output-channel symmetric int8. Activations: dynamic per-token
symmetric int8 at matmul time. The int8 x int8 → int32 contraction hits the
v5e MXU's native int8 mode (2x bf16 throughput); scales apply in a f32
epilogue, which XLA fuses.
"""

from typing import Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.layers.base import ParamSpec
from light_vllm_tpu.layers.linear import LinearMethodBase
from light_vllm_tpu.layers.quant.base import QuantizationConfig


def dynamic_quant_per_token(x: jnp.ndarray):
    """[T, in] → (int8 values, [T] f32 scales)
    (reference: dynamic_scaled_int8_quant, csrc int8_quant_kernels.cu)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


class Int8LinearMethod(LinearMethodBase):

    def create_specs(self, in_features, out_features, dtype, kernel_pspec):
        scale_pspec = P(kernel_pspec[1]) if len(kernel_pspec) > 1 else P()
        return {
            "kernel": ParamSpec((in_features, out_features), jnp.int8,
                                kernel_pspec),
            "scale": ParamSpec((out_features,), jnp.float32, scale_pspec),
        }

    def quantize_host(self, kernel):
        k = np.asarray(kernel, dtype=np.float32)
        amax = np.abs(k).max(axis=0)
        scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
        q = np.clip(np.round(k / scale[None, :]), -127, 127)
        return {"kernel": q.astype(np.int8), "scale": scale}

    def apply(self, layer, params, x):
        from light_vllm_tpu.layers.base import StackedKernelRef

        w = params["kernel"]
        if isinstance(w, StackedKernelRef):
            # Scan-over-layers stacked path: weight-only dequant (int8 ->
            # bf16 x per-channel scale) in the stacked Pallas kernel.
            # Mosaic has no native s8xs8 MXU lowering (measured: emulated,
            # ~1000x off), so W8A8's activation quant buys nothing inside
            # the scan — weight-only is numerically strictly better at
            # the same speed.
            from light_vllm_tpu.layers.quant.fp8 import _hoist_min_m
            from light_vllm_tpu.ops.stacked_matmul_pallas import \
                stacked_quantized_matmul
            from light_vllm_tpu.platforms import current_platform

            if x.shape[0] >= _hoist_min_m():
                # prefill-sized batches: hoisted XLA dequant + native dot
                # (see quant/fp8.py apply)
                wd = (w.stack[w.layer_idx].astype(jnp.float32)
                      * params["scale"]).astype(x.dtype)
                return jnp.dot(x, wd, preferred_element_type=x.dtype)
            return stacked_quantized_matmul(
                x, w.stack, params["scale"], w.layer_idx,
                interpret=not current_platform().is_tpu)
        xq, xscale = dynamic_quant_per_token(x)
        acc = jnp.dot(xq, w, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * xscale * params["scale"]
        return y.astype(x.dtype)


class Int8Config(QuantizationConfig):
    name = "int8"

    def get_linear_method(self) -> Int8LinearMethod:
        return Int8LinearMethod()

    def quantize_state(self, kernel: np.ndarray) -> Dict[str, np.ndarray]:
        k = kernel.astype(np.float32)
        amax = np.abs(k).max(axis=0)
        scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
        q = np.clip(np.round(k / scale[None, :]), -127, 127)
        return {"kernel": q.astype(np.int8), "scale": scale}
