"""Exhaustive check of the bitwise e4m3fn -> bf16 upconversion.

Every one of the 256 fp8 bit patterns must upconvert exactly (NaN excluded:
weights/KV never contain NaN, and the kernel maps it to a large finite
value instead of paying a vector compare for it).
"""

import jax
import jax.numpy as jnp
import numpy as np

from light_vllm_tpu.ops.fp8_cast import e4m3_to_bf16, upcast_kernel_operand


def _all_patterns():
    return np.arange(256, dtype=np.uint8).reshape(2, 128).view(
        jnp.float8_e4m3fn)


def test_e4m3_to_bf16_exhaustive():
    xs = _all_patterns()
    ref = xs.astype(np.float32)          # numpy's correct reference convert
    got = np.asarray(e4m3_to_bf16(jnp.asarray(xs)), dtype=np.float32)
    nan = np.isnan(ref)
    assert nan.sum() == 2                # +/- NaN are the only specials
    np.testing.assert_array_equal(got[~nan], ref[~nan])


def test_e4m3_to_bf16_inside_pallas_interpret():
    from jax.experimental import pallas as pl

    xs = _all_patterns()

    def kern(x_ref, o_ref):
        o_ref[...] = e4m3_to_bf16(x_ref[...])

    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((2, 128), jnp.bfloat16),
        interpret=True)(jnp.asarray(xs))
    ref = xs.astype(np.float32)
    nan = np.isnan(ref)
    np.testing.assert_array_equal(
        np.asarray(out, dtype=np.float32)[~nan], ref[~nan])


def test_upcast_kernel_operand_routes_and_passes_through():
    xs = jnp.asarray(_all_patterns())
    y = upcast_kernel_operand(xs, jnp.float32)
    assert y.dtype == jnp.float32
    z = upcast_kernel_operand(jnp.ones((4, 4), jnp.bfloat16), jnp.float32)
    assert z.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(z), 1.0)
