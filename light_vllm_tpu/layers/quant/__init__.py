"""Quantization method registry (reference:
light_vllm/backends/quantization/__init__.py:20-44).

The reference ships 15 CUDA-kernel-backed methods (awq, gptq, marlin
variants, fp8, ...). On TPU these collapse into a small family of
weight-layout + matmul strategies (SURVEY.md §2.7: "collapse into the same
Pallas weight-only matmul"):

  fp8       — weight-only float8_e4m3 storage, per-channel scale
  int8      — W8A8: int8 weights + dynamic per-token int8 activations,
              int32 MXU matmul, scale epilogue
  int4      — weight-only 4-bit (GPTQ/AWQ semantics), packed nibbles
  fp8_kv    — fp8 KV cache (handled by CacheConfig.cache_dtype)
"""

from typing import Optional

from light_vllm_tpu.layers.quant.base import QuantizationConfig


def quant_config_from_model_config(model_config
                                   ) -> Optional[QuantizationConfig]:
    """Resolve a model config's quantization method, carrying kwargs
    detected from a prequantized HF checkpoint (e.g. GPTQ group_size)."""
    return get_quantization_config(
        model_config.quantization,
        **getattr(model_config, "quantization_kwargs", {}))


def get_quantization_config(name: Optional[str],
                            **kwargs) -> Optional[QuantizationConfig]:
    if name is None:
        return None
    name = name.lower()
    if name in ("fp8", "fp8_e4m3"):
        from light_vllm_tpu.layers.quant.fp8 import Fp8Config

        return Fp8Config(**kwargs)
    if name in ("int8", "w8a8"):
        from light_vllm_tpu.layers.quant.int8 import Int8Config

        return Int8Config(**kwargs)
    if name in ("int4", "w4a16", "gptq", "awq"):
        from light_vllm_tpu.layers.quant.int4 import Int4Config

        return Int4Config(**kwargs)
    raise ValueError(f"unknown quantization method {name!r}; "
                     "supported: fp8, int8, int4")
