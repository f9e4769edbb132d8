"""Rotary position embedding zoo.

Counterpart of the reference's RoPE family (reference:
light_vllm/backends/rotary_embedding.py:60-865). TPU-native shape: cos/sin
caches are precomputed host-side as fp32 numpy (they are tiny), materialized
as a device constant, and the application is pure jnp — XLA fuses the gather
+ rotate into the QKV projection epilogue, replacing
csrc/pos_encoding_kernels.cu.

Supported scaling styles: none, "linear", "dynamic" (NTK), "yarn",
"deepseek_yarn" (DeepSeek-V2/V3 mscale-ratio YaRN), "llama3", "longrope"
(Phi-3 su-scaling). The reference's GemmaRotaryEmbedding variant
(rotary_embedding.py:726-733) differs from the base class only by
computing inv_freq through an int64 arange; this module computes all
caches in float64 numpy host-side, which subsumes that distinction
(documented design-out).
"""

import math
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _compute_inv_freq(rotary_dim: int, base: float) -> np.ndarray:
    return 1.0 / (base ** (np.arange(0, rotary_dim, 2, dtype=np.float64)
                           / rotary_dim))


def _yarn_find_correction_dim(num_rotations, dim, base, max_len) -> float:
    return (dim * math.log(max_len / (num_rotations * 2 * math.pi))) / \
        (2 * math.log(base))


def _yarn_find_correction_range(low_rot, high_rot, dim, base,
                                max_len) -> Tuple[int, int]:
    low = math.floor(_yarn_find_correction_dim(low_rot, dim, base, max_len))
    high = math.ceil(_yarn_find_correction_dim(high_rot, dim, base, max_len))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp(lo: float, hi: float, dim: int) -> np.ndarray:
    if lo == hi:
        hi += 0.001
    ramp = (np.arange(dim, dtype=np.float64) - lo) / (hi - lo)
    return np.clip(ramp, 0, 1)


class RotaryEmbedding:
    """Base RoPE with neox-style (rotate-half) or gptj-style (interleaved)
    layout."""

    def __init__(self, head_dim: int, rotary_dim: int, max_position: int,
                 base: float, is_neox_style: bool = True,
                 dtype=jnp.bfloat16) -> None:
        self.head_dim = head_dim
        self.rotary_dim = rotary_dim
        self.max_position = max_position
        self.base = float(base)
        self.is_neox_style = is_neox_style
        self.dtype = dtype
        cos, sin = self._compute_cos_sin_cache()
        # [max_position, rotary_dim // 2] each, fp32 — kept as HOST numpy:
        # a device-array attribute would be trace-captured as a jax.Array
        # constant, and every later lowering then fetches it back d2h
        # (mlir _array_mlir_constant_handler) — a pure waste, and over a
        # remote-device relay that fetch can wedge compiles entirely. A
        # numpy constant embeds host-side and uploads once per executable.
        self._cos_np = np.ascontiguousarray(cos, dtype=np.float32)
        self._sin_np = np.ascontiguousarray(sin, dtype=np.float32)

    # host-numpy views (kept under the old device-cache names for tests /
    # introspection)
    @property
    def cos_cache(self) -> np.ndarray:
        return self._cos_np

    @property
    def sin_cache(self) -> np.ndarray:
        return self._sin_np

    # --- cache construction (numpy, host) ---------------------------------
    def _inv_freq(self) -> np.ndarray:
        return _compute_inv_freq(self.rotary_dim, self.base)

    def _max_cache_len(self) -> int:
        return self.max_position

    def _compute_cos_sin_cache(self) -> Tuple[np.ndarray, np.ndarray]:
        inv_freq = self._inv_freq()
        t = np.arange(self._max_cache_len(), dtype=np.float64)
        freqs = np.outer(t, inv_freq)
        return (np.cos(freqs).astype(np.float32),
                np.sin(freqs).astype(np.float32))

    # --- application ------------------------------------------------------
    def __call__(self, positions: jnp.ndarray, q: jnp.ndarray,
                 k: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """positions [T]; q [T, num_heads*head_dim] or [T, H, head_dim];
        likewise k. Returns same shapes."""
        q_shape, k_shape = q.shape, k.shape
        q = q.reshape(q.shape[0], -1, self.head_dim)
        k = k.reshape(k.shape[0], -1, self.head_dim)
        # jnp.asarray of host numpy inside a trace embeds a host constant
        # (no d2h at lowering; see __init__ comment).
        cos = jnp.asarray(self._cos_np)[positions][:, None, :]  # [T,1,rd/2]
        sin = jnp.asarray(self._sin_np)[positions][:, None, :]
        q = self._apply(q, cos, sin)
        k = self._apply(k, cos, sin)
        return q.reshape(q_shape), k.reshape(k_shape)

    def _apply(self, x: jnp.ndarray, cos, sin) -> jnp.ndarray:
        rd = self.rotary_dim
        x_rot, x_pass = x[..., :rd], x[..., rd:]
        xf = x_rot.astype(jnp.float32)
        if self.is_neox_style:
            x1, x2 = xf[..., :rd // 2], xf[..., rd // 2:]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.concatenate([o1, o2], axis=-1)
        else:
            x1, x2 = xf[..., 0::2], xf[..., 1::2]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
        out = out.astype(x.dtype)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out


class LinearScalingRotaryEmbedding(RotaryEmbedding):
    """Positions divided by a constant factor
    (reference: rotary_embedding.py "linear")."""

    def __init__(self, *args, scaling_factor: float = 1.0, **kwargs):
        self.scaling_factor = float(scaling_factor)
        super().__init__(*args, **kwargs)

    def _max_cache_len(self) -> int:
        return int(self.max_position * self.scaling_factor)

    def _compute_cos_sin_cache(self):
        inv_freq = self._inv_freq()
        t = np.arange(self._max_cache_len(),
                      dtype=np.float64) / self.scaling_factor
        freqs = np.outer(t, inv_freq)
        return (np.cos(freqs).astype(np.float32),
                np.sin(freqs).astype(np.float32))


class DynamicNTKScalingRotaryEmbedding(RotaryEmbedding):
    """NTK-aware base rescaling ("dynamic")."""

    def __init__(self, *args, scaling_factor: float = 1.0, **kwargs):
        self.scaling_factor = float(scaling_factor)
        super().__init__(*args, **kwargs)

    def _max_cache_len(self) -> int:
        return int(self.max_position * self.scaling_factor)

    def _inv_freq(self) -> np.ndarray:
        base = self.base * (
            (self.scaling_factor * self._max_cache_len() / self.max_position)
            - (self.scaling_factor - 1)) ** (self.rotary_dim /
                                             (self.rotary_dim - 2))
        return _compute_inv_freq(self.rotary_dim, base)


class YaRNScalingRotaryEmbedding(RotaryEmbedding):
    """YaRN interpolation + attention-temperature scaling."""

    def __init__(self, *args, scaling_factor: float = 1.0,
                 extrapolation_factor: float = 1.0, attn_factor: float = 1.0,
                 beta_fast: float = 32, beta_slow: float = 1,
                 orig_max_position: Optional[int] = None, **kwargs):
        self.scaling_factor = float(scaling_factor)
        self.extrapolation_factor = extrapolation_factor
        self.attn_factor = attn_factor
        self.beta_fast = beta_fast
        self.beta_slow = beta_slow
        self.orig_max_position = orig_max_position
        self.mscale = self._compute_mscale()
        super().__init__(*args, **kwargs)

    def _compute_mscale(self) -> float:
        return float(0.1 * math.log(self.scaling_factor) + 1.0) \
            * self.attn_factor if self.scaling_factor > 1 \
            else 1.0 * self.attn_factor

    def _inv_freq(self) -> np.ndarray:
        orig_max = self.orig_max_position or self.max_position
        pos_freqs = self.base ** (
            np.arange(0, self.rotary_dim, 2, dtype=np.float64)
            / self.rotary_dim)
        inv_freq_extrapolation = 1.0 / pos_freqs
        inv_freq_interpolation = 1.0 / (self.scaling_factor * pos_freqs)
        lo, hi = _yarn_find_correction_range(self.beta_fast, self.beta_slow,
                                             self.rotary_dim, self.base,
                                             orig_max)
        mask = (1 - _yarn_linear_ramp(lo, hi, self.rotary_dim // 2)) \
            * self.extrapolation_factor
        return inv_freq_interpolation * (1 - mask) \
            + inv_freq_extrapolation * mask

    def _max_cache_len(self) -> int:
        orig_max = self.orig_max_position or self.max_position
        return int(orig_max * self.scaling_factor)

    def _compute_cos_sin_cache(self):
        inv_freq = self._inv_freq()
        t = np.arange(self._max_cache_len(), dtype=np.float64)
        freqs = np.outer(t, inv_freq)
        return ((np.cos(freqs) * self.mscale).astype(np.float32),
                (np.sin(freqs) * self.mscale).astype(np.float32))


def _yarn_get_mscale(scale: float, mscale: float) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


class DeepseekYaRNRotaryEmbedding(YaRNScalingRotaryEmbedding):
    """DeepSeek-V2/V3 YaRN: same interpolation as YaRN but the attention
    temperature is the RATIO of two mscale terms (config `mscale` /
    `mscale_all_dim`) — reference: rotary_embedding.py:613-682
    DeepseekScalingRotaryEmbedding / yarn_get_mscale(scale, mscale)."""

    def __init__(self, *args, mscale: float = 1.0,
                 mscale_all_dim: float = 0.0, **kwargs):
        self.ds_mscale = float(mscale)
        self.ds_mscale_all_dim = float(mscale_all_dim)
        super().__init__(*args, **kwargs)

    def _compute_mscale(self) -> float:
        return float(
            _yarn_get_mscale(self.scaling_factor, self.ds_mscale)
            / _yarn_get_mscale(self.scaling_factor, self.ds_mscale_all_dim)
            * self.attn_factor)


class Llama3RotaryEmbedding(RotaryEmbedding):
    """Llama-3.x extended-context frequency smoothing."""

    def __init__(self, *args, scaling_factor: float = 8.0,
                 low_freq_factor: float = 1.0, high_freq_factor: float = 4.0,
                 orig_max_position: int = 8192, **kwargs):
        self.scaling_factor = scaling_factor
        self.low_freq_factor = low_freq_factor
        self.high_freq_factor = high_freq_factor
        self.orig_max_position_l3 = orig_max_position
        super().__init__(*args, **kwargs)

    def _inv_freq(self) -> np.ndarray:
        inv_freq = _compute_inv_freq(self.rotary_dim, self.base)
        low_wavelen = self.orig_max_position_l3 / self.low_freq_factor
        high_wavelen = self.orig_max_position_l3 / self.high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        smooth = (self.orig_max_position_l3 / wavelen - self.low_freq_factor) \
            / (self.high_freq_factor - self.low_freq_factor)
        scaled = np.where(
            wavelen > low_wavelen, inv_freq / self.scaling_factor,
            np.where(wavelen < high_wavelen, inv_freq,
                     (1 - smooth) * inv_freq / self.scaling_factor
                     + smooth * inv_freq))
        return scaled


class Phi3LongRoPEScaledRotaryEmbedding(RotaryEmbedding):
    """Phi-3 "longrope": separate per-dim rescale factors for short/long."""

    def __init__(self, head_dim, rotary_dim, max_position, base,
                 is_neox_style=True, dtype=jnp.bfloat16, *,
                 short_factor=None, long_factor=None,
                 orig_max_position: int = 4096):
        self.short_factor = np.asarray(short_factor, dtype=np.float64)
        self.long_factor = np.asarray(long_factor, dtype=np.float64)
        self.orig_max_position_p3 = orig_max_position
        scale = max_position / orig_max_position
        if scale <= 1.0:
            self.mscale = 1.0
        else:
            self.mscale = math.sqrt(1 + math.log(scale)
                                    / math.log(orig_max_position))
        super().__init__(head_dim, rotary_dim, max_position, base,
                         is_neox_style, dtype)

    def _compute_cos_sin_cache(self):
        base_inv = _compute_inv_freq(self.rotary_dim, self.base)
        t = np.arange(self.max_position, dtype=np.float64)
        # Short factors up to the original max, long factors beyond.
        factors = np.where(
            t[:, None] < self.orig_max_position_p3,
            self.short_factor[None, :], self.long_factor[None, :])
        freqs = t[:, None] * (base_inv[None, :] / factors)
        return ((np.cos(freqs) * self.mscale).astype(np.float32),
                (np.sin(freqs) * self.mscale).astype(np.float32))


_ROPE_CACHE: Dict[Any, RotaryEmbedding] = {}


def get_rope(head_dim: int, rotary_dim: int, max_position: int, base: float,
             is_neox_style: bool = True,
             rope_scaling: Optional[Dict[str, Any]] = None,
             dtype=jnp.bfloat16) -> RotaryEmbedding:
    key = (head_dim, rotary_dim, max_position, base, is_neox_style,
           tuple(sorted(rope_scaling.items())) if isinstance(rope_scaling,
                                                             dict) and all(
               not isinstance(v, (list, dict))
               for v in rope_scaling.values()) else repr(rope_scaling),
           jnp.dtype(dtype).name)
    if key in _ROPE_CACHE:
        return _ROPE_CACHE[key]

    if not rope_scaling:
        rope = RotaryEmbedding(head_dim, rotary_dim, max_position, base,
                               is_neox_style, dtype)
    else:
        scaling_type = rope_scaling.get("rope_type",
                                        rope_scaling.get("type"))
        factor = rope_scaling.get("factor", 1.0)
        if scaling_type == "linear":
            rope = LinearScalingRotaryEmbedding(
                head_dim, rotary_dim, max_position, base, is_neox_style,
                dtype, scaling_factor=factor)
        elif scaling_type == "dynamic":
            rope = DynamicNTKScalingRotaryEmbedding(
                head_dim, rotary_dim, max_position, base, is_neox_style,
                dtype, scaling_factor=factor)
        elif scaling_type == "yarn":
            rope = YaRNScalingRotaryEmbedding(
                head_dim, rotary_dim, max_position, base, is_neox_style,
                dtype, scaling_factor=factor,
                orig_max_position=rope_scaling.get(
                    "original_max_position_embeddings"),
                beta_fast=rope_scaling.get("beta_fast", 32),
                beta_slow=rope_scaling.get("beta_slow", 1),
                attn_factor=rope_scaling.get("attn_factor", 1.0))
        elif scaling_type == "deepseek_yarn":
            rope = DeepseekYaRNRotaryEmbedding(
                head_dim, rotary_dim, max_position, base, is_neox_style,
                dtype, scaling_factor=factor,
                orig_max_position=rope_scaling.get(
                    "original_max_position_embeddings"),
                beta_fast=rope_scaling.get("beta_fast", 32),
                beta_slow=rope_scaling.get("beta_slow", 1),
                attn_factor=rope_scaling.get("attn_factor", 1.0),
                mscale=rope_scaling.get("mscale", 1.0),
                mscale_all_dim=rope_scaling.get("mscale_all_dim", 0.0))
        elif scaling_type == "llama3":
            rope = Llama3RotaryEmbedding(
                head_dim, rotary_dim, max_position, base, is_neox_style,
                dtype, scaling_factor=factor,
                low_freq_factor=rope_scaling.get("low_freq_factor", 1.0),
                high_freq_factor=rope_scaling.get("high_freq_factor", 4.0),
                orig_max_position=rope_scaling.get(
                    "original_max_position_embeddings", 8192))
        elif scaling_type == "longrope":
            rope = Phi3LongRoPEScaledRotaryEmbedding(
                head_dim, rotary_dim, max_position, base, is_neox_style,
                dtype, short_factor=rope_scaling["short_factor"],
                long_factor=rope_scaling["long_factor"],
                orig_max_position=rope_scaling.get(
                    "original_max_position_embeddings", 4096))
        else:
            raise ValueError(f"unknown rope scaling type {scaling_type!r}")
    _ROPE_CACHE[key] = rope
    return rope
