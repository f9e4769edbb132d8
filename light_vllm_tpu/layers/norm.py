"""Normalization layers (reference: light_vllm/backends/layernorm.py:10,76).

Plain jnp: XLA fuses RMSNorm into neighboring ops on TPU, so no Pallas kernel
is needed here (the reference needed csrc/layernorm_kernels.cu only because
eager torch wouldn't fuse). Residual-add fusion is expressed by returning the
pre-normalized sum, mirroring fused_add_rms_norm semantics.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.layers.base import Layer, ParamSpec, Params


def _ones_init(key, shape, dtype):
    return jnp.ones(shape, dtype)


def _zeros_init(key, shape, dtype):
    return jnp.zeros(shape, dtype)


class RMSNorm(Layer):

    def __init__(self, hidden_size: int, eps: float = 1e-6,
                 dtype=jnp.bfloat16) -> None:
        super().__init__()
        self.eps = eps
        self._specs = {
            "weight": ParamSpec((hidden_size,), dtype, P(), init=_ones_init)
        }

    def __call__(self, params: Params, x: jnp.ndarray,
                 residual: Optional[jnp.ndarray] = None):
        orig_dtype = x.dtype
        if residual is not None:
            x = x + residual
            residual = x
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        normed = xf * jax.lax.rsqrt(var + self.eps)
        out = (normed.astype(orig_dtype) * params["weight"].astype(orig_dtype))
        if residual is not None:
            return out, residual
        return out


class GemmaRMSNorm(RMSNorm):
    """Gemma stores weight as (1 + w) (reference: layernorm.py:76)."""

    def __call__(self, params, x, residual=None):
        orig_dtype = x.dtype
        if residual is not None:
            x = x + residual
            residual = x
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        normed = xf * (1.0 / jnp.sqrt(var + self.eps))
        out = (normed * (1.0 + params["weight"].astype(jnp.float32))).astype(
            orig_dtype)
        if residual is not None:
            return out, residual
        return out


class LayerNorm(Layer):
    """Full LayerNorm (BERT-family encoders)."""

    def __init__(self, hidden_size: int, eps: float = 1e-12,
                 dtype=jnp.bfloat16) -> None:
        super().__init__()
        self.eps = eps
        self._specs = {
            "weight": ParamSpec((hidden_size,), dtype, P(), init=_ones_init),
            "bias": ParamSpec((hidden_size,), dtype, P(), init=_zeros_init),
        }

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        normed = (xf - mean) / jnp.sqrt(var + self.eps)
        out = normed * params["weight"].astype(jnp.float32) + \
            params["bias"].astype(jnp.float32)
        return out.astype(orig_dtype)
