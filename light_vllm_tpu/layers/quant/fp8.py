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


def fp8_exec_mode() -> str:
    """How fp8 checkpoints EXECUTE on this platform: "fp8" (e4m3 storage,
    bitwise VPU dequant in-kernel) or "int8" (per-channel int8 storage,
    native convert). LVT_FP8_EXEC overrides; "auto" picks int8 on TPU.

    Rationale (measured, v5e): the MXU has no fp8 datapath, so fp8 weights
    must be upconverted on the VPU every step. The bitwise e4m3->bf16
    sequence (ops/fp8_cast.py) holds the stacked decode matmul to
    ~173 GB/s of weight read, while int8's single native convert reaches
    ~317 GB/s (bf16 kernel: 744 GB/s) — the fp8 8B decode step measured
    13x off its weight-read roofline. Per-channel int8 is the
    hardware-native 8-bit weight format on TPU; set LVT_FP8_EXEC=fp8 for
    bitwise-exact e4m3 semantics."""
    import os

    mode = os.environ.get("LVT_FP8_EXEC", "auto")
    if mode in ("fp8", "int8"):
        return mode
    from light_vllm_tpu.platforms import current_platform

    return "int8" if current_platform().is_tpu else "fp8"


def _hoist_min_m() -> int:
    """Batch size above which stacked-fp8 matmuls hoist the layer dequant
    into an XLA fusion + native dot instead of inline Mosaic dequant (see
    apply). XLA fuses the e4m3->bf16 convert into the dot without
    materializing the weight copy (profiled ~95% MFU on the 8B prefill),
    while Mosaic's emulated convert holds the inline kernel to ~25% MFU."""
    import os

    return int(os.environ.get("LVT_FP8_HOIST_MIN_M", "1024"))


class Fp8LinearMethod(LinearMethodBase):
    """storage "fp8" keeps e4m3 bits; "int8" stores per-channel int8
    (see fp8_exec_mode) — specs, scales, and every matmul path are shared,
    only the element encoding differs."""

    def __init__(self, use_pallas: bool = True,
                 storage: str = "fp8") -> None:
        self.use_pallas = use_pallas
        self.storage = storage
        self._qdtype = jnp.int8 if storage == "int8" \
            else jnp.float8_e4m3fn
        self._qmax = 127.0 if storage == "int8" else FP8_MAX

    def create_specs(self, in_features, out_features, dtype, kernel_pspec):
        scale_pspec = P(kernel_pspec[1]) if len(kernel_pspec) > 1 else P()
        return {
            "kernel": ParamSpec((in_features, out_features),
                                self._qdtype, kernel_pspec),
            "scale": ParamSpec((out_features,), jnp.float32, scale_pspec),
        }

    def quantize_host(self, kernel):
        import numpy as np

        k = np.asarray(kernel, dtype=np.float32)
        amax = np.abs(k).max(axis=0)
        scale = np.maximum(amax / self._qmax, 1e-12).astype(np.float32)
        q = np.clip(k / scale[None, :], -self._qmax, self._qmax)
        if self.storage == "int8":
            return {"kernel": np.round(q).astype(np.int8), "scale": scale}
        return {"kernel": q.astype(jnp.float8_e4m3fn), "scale": scale}

    def transcode_host(self, raw):
        """Prequantized e4m3 params (Fp8Tensor splat) → this method's
        storage. fp8 values fill [-448, 448] on their per-channel scale;
        int8 re-uses the channel scale rescaled by 448/127, so only the
        element rounding changes (bounded by int8's uniform step)."""
        import numpy as np

        k = raw["kernel"]
        if self.storage != "int8" \
                or np.dtype(k.dtype) != np.dtype(jnp.float8_e4m3fn):
            return raw
        q = np.round(np.asarray(k, np.float32) * (127.0 / FP8_MAX))
        out = dict(raw)
        out["kernel"] = np.clip(q, -127, 127).astype(np.int8)
        out["scale"] = (np.asarray(raw["scale"], np.float32)
                        * np.float32(FP8_MAX / 127.0))
        return out

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
        return Fp8LinearMethod(storage=fp8_exec_mode())

    def quantize_state(self, kernel: np.ndarray) -> Dict[str, np.ndarray]:
        k = kernel.astype(np.float32)
        amax = np.abs(k).max(axis=0)  # per output channel
        scale = np.maximum(amax / FP8_MAX, 1e-12).astype(np.float32)
        q = np.clip(k / scale[None, :], -FP8_MAX, FP8_MAX)
        return {"kernel": q.astype(jnp.float8_e4m3fn), "scale": scale}
