"""Activation functions (reference: light_vllm/backends/activation.py:14-184).

All plain jnp — XLA fuses these into the surrounding matmuls on TPU, which is
exactly why the reference's csrc/activation_kernels.cu has no Pallas
equivalent here. The *AndMul variants take the fused [..., 2*d] gate/up
projection and return d outputs.
"""

import math

import jax
import jax.numpy as jnp


def silu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * up


def gelu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=False) * up


def gelu_tanh_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=True) * up


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + jnp.tanh(0.7978845608028654 * xf *
                                     (1.0 + 0.044715 * xf * xf)))
    return out.astype(x.dtype)


def gelu_quick(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def relu2(x: jnp.ndarray) -> jnp.ndarray:
    r = jnp.maximum(x, 0)
    return r * r


_ACTIVATIONS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": gelu_new,
    "gelu_fast": gelu_fast,
    "gelu_quick": gelu_quick,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu2": relu2,
    "tanh": jnp.tanh,
}

_GATED_ACTIVATIONS = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "gelu_tanh": gelu_tanh_and_mul,
    "gelu_pytorch_tanh": gelu_tanh_and_mul,
}


def get_act_fn(name: str):
    if name not in _ACTIVATIONS:
        raise ValueError(f"unknown activation {name!r}")
    return _ACTIVATIONS[name]


def get_gated_act_fn(name: str):
    if name not in _GATED_ACTIVATIONS:
        raise ValueError(f"unknown gated activation {name!r}")
    return _GATED_ACTIVATIONS[name]


def gated_act_kernel_name(fn) -> str:
    """Canonical epilogue name a gated-act fn maps to inside the fused
    stacked gate_up kernel (ops/stacked_matmul_pallas._GATED_EPILOGUES),
    or None when no fused epilogue exists."""
    return {silu_and_mul: "silu", gelu_and_mul: "gelu",
            gelu_tanh_and_mul: "gelu_tanh"}.get(fn)
