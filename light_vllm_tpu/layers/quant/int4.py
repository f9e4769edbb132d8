"""INT4 weight-only quantization — GPTQ/AWQ semantics collapsed into one
TPU-friendly layout (reference: csrc/quantization/gptq + awq + the marlin
family, SURVEY.md §2.7 "one kernel family covers GPTQ/AWQ semantics").

Layout: group-wise symmetric int4, two nibbles packed per int8 along the
input dim: packed [in/2, out] int8, scales [in/groups, out] f32 (group_size
along input, default 128). Dequant is unpack → scale → bf16 matmul; the
Pallas fused path avoids the bf16 materialization.
"""

from typing import Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.layers.base import ParamSpec
from light_vllm_tpu.layers.linear import LinearMethodBase
from light_vllm_tpu.layers.quant.base import QuantizationConfig


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[in/2, out] int8 → [in, out] int8 in [-8, 7]."""
    lo = jnp.bitwise_and(packed, 0x0F).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.right_shift(packed.astype(jnp.uint8), 4).astype(jnp.int8)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    # interleave rows: packed row r holds input rows 2r (lo) and 2r+1 (hi)
    out = jnp.stack([lo, hi], axis=1)  # [in/2, 2, out]
    return out.reshape(packed.shape[0] * 2, packed.shape[1])


class Int4LinearMethod(LinearMethodBase):

    def __init__(self, group_size: int = 128) -> None:
        self.group_size = group_size

    def create_specs(self, in_features, out_features, dtype, kernel_pspec):
        g = self.group_size
        scale_pspec = kernel_pspec
        return {
            "kernel": ParamSpec((in_features // 2, out_features), jnp.int8,
                                kernel_pspec),
            "scale": ParamSpec((max(in_features // g, 1), out_features),
                               jnp.float32, scale_pspec),
        }

    def quantize_host(self, kernel):
        k = np.asarray(kernel, dtype=np.float32)
        in_f, out_f = k.shape
        g = min(self.group_size, in_f)
        ng = in_f // g
        kg = k.reshape(ng, g, out_f)
        amax = np.abs(kg).max(axis=1)
        scale = np.maximum(amax / 7.0, 1e-12).astype(np.float32)
        q = np.clip(np.round(kg / scale[:, None, :]), -8, 7).astype(np.int8)
        q = q.reshape(in_f, out_f)
        packed = ((q[0::2] & 0x0F) | ((q[1::2] & 0x0F) << 4)).astype(np.int8)
        return {"kernel": packed, "scale": scale}

    def apply(self, layer, params, x):
        w = unpack_int4(params["kernel"]).astype(jnp.float32)
        g = self.group_size
        in_features = w.shape[0]
        scales = params["scale"]  # [in/g, out]
        wd = (w.reshape(scales.shape[0], -1, w.shape[1])
              * scales[:, None, :]).reshape(in_features, w.shape[1])
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
        k = kernel.astype(np.float32)
        in_f, out_f = k.shape
        g = min(self.group_size, in_f)
        ng = in_f // g
        kg = k.reshape(ng, g, out_f)
        amax = np.abs(kg).max(axis=1)  # [ng, out]
        scale = np.maximum(amax / 7.0, 1e-12).astype(np.float32)
        q = np.clip(np.round(kg / scale[:, None, :]), -8, 7).astype(np.int8)
        q = q.reshape(in_f, out_f)
        lo = q[0::2] & 0x0F
        hi = (q[1::2] & 0x0F) << 4
        packed = (lo | hi).astype(np.int8)
        return {"kernel": packed, "scale": scale}
