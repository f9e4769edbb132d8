"""Pallas fused dequant + matmul for weight-only quantized linears.

TPU-native replacement for the reference's quantized-GEMM kernel zoo
(reference: csrc/quantization/fp8/fp8_marlin.cu, marlin/, gptq_marlin/ —
SURVEY.md §2.7 "collapse into the same Pallas weight-only matmul"). The
weight stays fp8/int8 in HBM and VMEM; dequantization happens on the tile
inside the kernel right before the MXU contraction, so the bf16 copy is
never materialized in HBM — the bandwidth win is the whole point of
weight-only quantization on v5e.

    x [T, K] bf16 · w [K, N] fp8/int8, scale [N] f32 → y [T, N] bf16
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_vllm_tpu.ops.fp8_cast import upcast_kernel_operand
from light_vllm_tpu.utils import cdiv


def _qmm_kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fp8 routes through the bitwise VPU path (Mosaic's emulated e4m3
    # convert is ~11 cyc/elem — see ops/fp8_cast.py); int8 is native.
    w = upcast_kernel_operand(w_ref[:], jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        # scale_ref is [1, block_n] (2-D so Mosaic's lane layout matches
        # XLA's padded layout for the f32 vector); broadcasts over rows.
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_n", "block_k",
                                             "interpret"))
def quantized_matmul(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                     *, block_t: int = 256, block_n: int = 512,
                     block_k: int = 512, interpret: bool = False
                     ) -> jnp.ndarray:
    """x [T, K] bf16/f32; w [K, N] quantized; scale [N] f32 per-channel."""
    T, K = x.shape
    K2, N = w.shape
    assert K == K2
    block_t = min(block_t, max(8 * cdiv(T, 8), 8))
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    n_t, n_n, n_k = cdiv(T, block_t), cdiv(N, block_n), cdiv(K, block_k)

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k),
        grid=(n_t, n_n, n_k),
        in_specs=[
            pl.BlockSpec((block_t, block_k), lambda t, n, k: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda t, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda t, n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, block_n), lambda t, n, k: (t, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, w, scale.reshape(1, N))
    return out
