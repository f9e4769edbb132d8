"""RoPE zoo (layers/rotary.py) — dispatch + cache math vs hand formulas
(reference: backends/rotary_embedding.py:60-736)."""

import math

import numpy as np
import pytest


def _mk(scaling=None, max_position=64, base=10000.0, head_dim=16):
    from light_vllm_tpu.layers.rotary import get_rope

    return get_rope(head_dim, head_dim, max_position, base,
                    rope_scaling=scaling)


def test_base_rotation_matches_manual():
    import jax.numpy as jnp

    rope = _mk()
    d = rope.head_dim
    q = np.random.default_rng(0).standard_normal((3, 2, d)).astype(
        np.float32)
    pos = np.array([0, 5, 17], np.int32)
    qr, _ = rope(jnp.asarray(pos), jnp.asarray(q), jnp.asarray(q))
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    for i, p in enumerate(pos):
        ang = p * inv
        cos, sin = np.cos(ang), np.sin(ang)
        x1, x2 = q[i, :, :d // 2], q[i, :, d // 2:]
        want = np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                              axis=-1)
        np.testing.assert_allclose(np.asarray(qr[i], np.float32), want,
                                   rtol=2e-2, atol=2e-2)


def test_dispatch_zoo():
    from light_vllm_tpu.layers.rotary import (
        DeepseekYaRNRotaryEmbedding, DynamicNTKScalingRotaryEmbedding,
        Llama3RotaryEmbedding, LinearScalingRotaryEmbedding,
        Phi3LongRoPEScaledRotaryEmbedding, YaRNScalingRotaryEmbedding)

    assert isinstance(_mk({"type": "linear", "factor": 2.0}),
                      LinearScalingRotaryEmbedding)
    assert isinstance(_mk({"type": "dynamic", "factor": 2.0}),
                      DynamicNTKScalingRotaryEmbedding)
    assert isinstance(
        _mk({"type": "yarn", "factor": 2.0,
             "original_max_position_embeddings": 32}),
        YaRNScalingRotaryEmbedding)
    assert isinstance(
        _mk({"rope_type": "deepseek_yarn", "factor": 4.0, "mscale": 0.707,
             "mscale_all_dim": 0.707,
             "original_max_position_embeddings": 16}, max_position=64),
        DeepseekYaRNRotaryEmbedding)
    assert isinstance(
        _mk({"rope_type": "llama3", "factor": 8.0,
             "original_max_position_embeddings": 32}),
        Llama3RotaryEmbedding)
    assert isinstance(
        _mk({"type": "longrope", "short_factor": [1.0] * 8,
             "long_factor": [2.0] * 8,
             "original_max_position_embeddings": 32}),
        Phi3LongRoPEScaledRotaryEmbedding)
    with pytest.raises(ValueError):
        _mk({"type": "nope", "factor": 2.0})


def test_deepseek_mscale_ratio():
    """DeepSeek's attention temperature is
    yarn_get_mscale(s, mscale) / yarn_get_mscale(s, mscale_all_dim)
    (reference: rotary_embedding.py:613-651). With mscale ==
    mscale_all_dim the ratio is exactly 1 — cos/sin caches carry NO
    temperature (DeepSeek-V2's published config shape)."""
    rope = _mk({"rope_type": "deepseek_yarn", "factor": 4.0,
                "mscale": 0.707, "mscale_all_dim": 0.707,
                "original_max_position_embeddings": 16}, max_position=64)
    assert rope.mscale == pytest.approx(1.0)

    rope2 = _mk({"rope_type": "deepseek_yarn", "factor": 4.0,
                 "mscale": 1.0, "mscale_all_dim": 0.0,
                 "original_max_position_embeddings": 16}, max_position=64)
    want = (0.1 * 1.0 * math.log(4.0) + 1.0) / 1.0
    assert rope2.mscale == pytest.approx(want)
    # cache is scaled by mscale: ratio of position-0 cos rows
    assert float(rope2.cos_cache[0, 0]) == pytest.approx(want, rel=1e-5)
    # cache extends to factor * original
    assert rope2.cos_cache.shape[0] == 64


def test_yarn_interpolation_bounds():
    """YaRN inv_freq must lie between pure interpolation and pure
    extrapolation for every dim."""
    from light_vllm_tpu.layers.rotary import YaRNScalingRotaryEmbedding

    rope = _mk({"type": "yarn", "factor": 4.0,
                "original_max_position_embeddings": 16}, max_position=64)
    assert isinstance(rope, YaRNScalingRotaryEmbedding)
    inv = rope._inv_freq()
    base_inv = 1.0 / (10000.0 ** (np.arange(0, 16, 2) / 16))
    lo = np.minimum(base_inv, base_inv / 4.0)
    hi = np.maximum(base_inv, base_inv / 4.0)
    assert np.all(inv >= lo - 1e-12) and np.all(inv <= hi + 1e-12)
