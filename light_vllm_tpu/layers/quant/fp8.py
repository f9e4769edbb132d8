"""FP8 weight-only quantization (reference:
light_vllm/backends/quantization/fp8.py:31-180 Fp8Config/Fp8LinearMethod).

Weights stored float8_e4m3fn with a per-output-channel f32 scale; the matmul
runs in bf16 after an in-matmul dequant. On v5e the MXU has no fp8 mode, so
fp8 here buys HBM bandwidth/capacity (2x vs bf16) — exactly what serving is
bound by. The fused dequant+matmul Pallas kernel (ops/quant_matmul_pallas)
avoids materializing the bf16 copy; the jnp fallback relies on XLA fusion.
"""

from typing import Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.layers.base import ParamSpec
from light_vllm_tpu.layers.linear import LinearMethodBase
from light_vllm_tpu.layers.quant.base import QuantizationConfig

FP8_MAX = 448.0  # e4m3fn


def _hoist_min_m() -> int:
    """Batch size above which stacked-fp8 matmuls hoist the layer dequant
    into an XLA fusion + native dot instead of inline Mosaic dequant (see
    apply). XLA fuses the e4m3->bf16 convert into the dot without
    materializing the weight copy (profiled ~95% MFU on the 8B prefill),
    while Mosaic's emulated convert holds the inline kernel to ~25% MFU."""
    import os

    return int(os.environ.get("LVT_FP8_HOIST_MIN_M", "1024"))


class Fp8LinearMethod(LinearMethodBase):

    def __init__(self, use_pallas: bool = True) -> None:
        self.use_pallas = use_pallas

    def create_specs(self, in_features, out_features, dtype, kernel_pspec):
        scale_pspec = P(kernel_pspec[1]) if len(kernel_pspec) > 1 else P()
        return {
            "kernel": ParamSpec((in_features, out_features),
                                jnp.float8_e4m3fn, kernel_pspec),
            "scale": ParamSpec((out_features,), jnp.float32, scale_pspec),
        }

    def quantize_host(self, kernel):
        import numpy as np

        k = np.asarray(kernel, dtype=np.float32)
        amax = np.abs(k).max(axis=0)
        scale = np.maximum(amax / FP8_MAX, 1e-12).astype(np.float32)
        q = np.clip(k / scale[None, :], -FP8_MAX, FP8_MAX)
        return {"kernel": q.astype(jnp.float8_e4m3fn), "scale": scale}

    def apply(self, layer, params, x):
        from light_vllm_tpu.layers.base import StackedKernelRef

        w = params["kernel"]
        scale = params["scale"]
        if isinstance(w, StackedKernelRef):
            from light_vllm_tpu.ops.stacked_matmul_pallas import \
                stacked_quantized_matmul
            from light_vllm_tpu.platforms import current_platform

            if x.shape[0] >= _hoist_min_m():
                # Prefill-sized batches: Mosaic's e4m3->bf16 convert is
                # emulated (~11 cycles/elem), so the inline-dequant kernel
                # runs at ~25% MFU; hoisting the dequant into one XLA
                # fusion and using the native dot measures 3.7 ms vs
                # 9.7 ms on the 8B gate_up (66% vs 25% MFU). Small
                # (decode) batches keep the inline kernel — materializing
                # the 2-byte layer copy for 128 rows would be pure
                # bandwidth waste there.
                wd = (w.stack[w.layer_idx].astype(jnp.float32)
                      * scale).astype(x.dtype)
                return jnp.dot(x, wd, preferred_element_type=x.dtype)
            return stacked_quantized_matmul(
                x, w.stack, scale, w.layer_idx,
                interpret=not current_platform().is_tpu)
        if self.use_pallas and _pallas_ok(x, w):
            from light_vllm_tpu.ops.quant_matmul_pallas import \
                quantized_matmul

            return quantized_matmul(x, w, scale)
        wd = w.astype(x.dtype)
        y = jnp.dot(x, wd, preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)


def _pallas_ok(x, w) -> bool:
    from light_vllm_tpu.platforms import current_platform

    return (current_platform().is_tpu
            and x.shape[-1] % 256 == 0 and w.shape[1] % 256 == 0)


class Fp8Config(QuantizationConfig):
    name = "fp8"

    def get_linear_method(self) -> Fp8LinearMethod:
        return Fp8LinearMethod()

    def quantize_state(self, kernel: np.ndarray) -> Dict[str, np.ndarray]:
        k = kernel.astype(np.float32)
        amax = np.abs(k).max(axis=0)  # per output channel
        scale = np.maximum(amax / FP8_MAX, 1e-12).astype(np.float32)
        q = np.clip(k / scale[None, :], -FP8_MAX, FP8_MAX)
        return {"kernel": q.astype(jnp.float8_e4m3fn), "scale": scale}
