"""INT4 weight-only quantization — GPTQ/AWQ semantics collapsed into one
TPU-friendly layout (reference: csrc/quantization/gptq + awq + the marlin
family, SURVEY.md §2.7 "one kernel family covers GPTQ/AWQ semantics").

Layout: group-wise **asymmetric** uint4, two nibbles packed per int8 along
the input dim: packed [in/2, out] int8, scale [in/g, out] f32, zero
[in/g, out] f32 (group_size along input, default 128). Dequant is
(q - zero) * scale. Symmetric on-the-fly quantization stores zero = 8; real
GPTQ/AWQ checkpoints keep their exact zero points (see quant/ingest.py) so
ingestion is lossless — no requantization, unlike the reference's marlin
repack path which reshuffles bits but likewise preserves values.
"""

from typing import Dict

import jax.numpy as jnp
import numpy as np

from light_vllm_tpu.layers.base import ParamSpec
from light_vllm_tpu.layers.linear import LinearMethodBase
from light_vllm_tpu.layers.quant.base import QuantizationConfig


def unpack_uint4(packed: jnp.ndarray) -> jnp.ndarray:
    """[in/2, out] int8 → [in, out] int8 in [0, 15].

    Packed row r holds input rows 2r (low nibble) and 2r+1 (high nibble).
    """
    u = packed.astype(jnp.uint8)
    lo = jnp.bitwise_and(u, 0x0F).astype(jnp.int8)
    hi = jnp.right_shift(u, 4).astype(jnp.int8)
    out = jnp.stack([lo, hi], axis=1)  # [in/2, 2, out]
    return out.reshape(packed.shape[0] * 2, packed.shape[1])


def pack_uint4(q: np.ndarray) -> np.ndarray:
    """[in, out] uint values in [0,15] → [in/2, out] int8 (lo=even row)."""
    q = q.astype(np.uint8)
    return ((q[0::2] & 0x0F) | ((q[1::2] & 0x0F) << 4)).astype(np.int8)


def _quantize_sym(kernel: np.ndarray, group_size: int
                  ) -> Dict[str, np.ndarray]:
    """On-the-fly host quantization of a float [in, out] kernel: symmetric
    per-group scales expressed in the asymmetric layout (zero = 8)."""
    k = np.asarray(kernel, dtype=np.float32)
    in_f, out_f = k.shape
    g = min(group_size, in_f)
    ng = in_f // g
    kg = k.reshape(ng, g, out_f)
    amax = np.abs(kg).max(axis=1)
    scale = np.maximum(amax / 7.0, 1e-12).astype(np.float32)
    q = np.clip(np.round(kg / scale[:, None, :]), -8, 7).astype(np.int8)
    q = (q + 8).reshape(in_f, out_f)
    zero = np.full_like(scale, 8.0)
    return {"kernel": pack_uint4(q), "scale": scale, "zero": zero}


class Int4LinearMethod(LinearMethodBase):

    def __init__(self, group_size: int = 128) -> None:
        self.group_size = group_size

    def create_specs(self, in_features, out_features, dtype, kernel_pspec):
        g = min(self.group_size, in_features)
        ng = max(in_features // g, 1)
        return {
            "kernel": ParamSpec((in_features // 2, out_features), jnp.int8,
                                kernel_pspec),
            "scale": ParamSpec((ng, out_features), jnp.float32, kernel_pspec),
            "zero": ParamSpec((ng, out_features), jnp.float32, kernel_pspec),
        }

    def quantize_host(self, kernel):
        return _quantize_sym(kernel, self.group_size)

    def apply(self, layer, params, x):
        q = unpack_uint4(params["kernel"]).astype(jnp.float32)
        scales = params["scale"]  # [ng, out]
        zeros = params["zero"]
        in_features, out_f = q.shape[0], q.shape[1]
        qg = q.reshape(scales.shape[0], -1, out_f)
        wd = ((qg - zeros[:, None, :]) * scales[:, None, :]
              ).reshape(in_features, out_f)
        y = jnp.dot(x, wd.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        return y.astype(x.dtype)


class Int4Config(QuantizationConfig):
    name = "int4"

    def __init__(self, group_size: int = 128) -> None:
        self.group_size = group_size

    def get_linear_method(self) -> Int4LinearMethod:
        return Int4LinearMethod(self.group_size)

    def quantize_state(self, kernel: np.ndarray) -> Dict[str, np.ndarray]:
        return _quantize_sym(kernel, self.group_size)
