"""Quantization config + method base classes (reference:
light_vllm/backends/quantization/base_config.py QuantizationConfig /
QuantizeMethodBase)."""

from typing import Any, Dict

import numpy as np

from light_vllm_tpu.layers.linear import LinearMethodBase


class QuantizationConfig:
    """Describes a quantization scheme; hands out per-layer methods."""

    name: str = "base"

    def get_linear_method(self) -> LinearMethodBase:
        raise NotImplementedError

    def quantize_state(self, kernel: np.ndarray) -> Dict[str, np.ndarray]:
        """Quantize a host-side [in, out] f32/bf16 kernel into this scheme's
        param dict (on-the-fly quantization at load time)."""
        raise NotImplementedError
