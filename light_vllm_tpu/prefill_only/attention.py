"""Encoder attention backend selector (reference:
light_vllm/prefill_only/backends/attention/selector.py:15-100).

Two interchangeable impls instead of the reference's five (its xformers/
sdpa/flashinfer zoo collapses on TPU):
  - "reference": pure-jnp masked attention (CPU + correctness baseline)
  - "pallas": Pallas flash attention (TPU hot path)
selected by env LVT_ATTENTION_BACKEND or by platform.
"""

import enum
from typing import Optional

from light_vllm_tpu import envs
from light_vllm_tpu.logger import init_logger
from light_vllm_tpu.platforms import current_platform

logger = init_logger(__name__)


class AttnType(enum.Enum):
    DECODER = "DECODER"   # causal
    ENCODER = "ENCODER"   # bidirectional


class EncoderAttnBackend:
    name = "reference"

    def __init__(self, attn_type: AttnType) -> None:
        self.attn_type = attn_type

    @classmethod
    def from_engine(cls, engine):
        attn_type = AttnType(getattr(engine.workflow, "attn_type", "ENCODER"))
        backend = get_attn_backend(attn_type)
        return backend

    def __call__(self, q, k, v, mask, *, scale=None):
        from light_vllm_tpu.ops.attention_ref import dense_attention

        return dense_attention(q, k, v, mask.astype(bool),
                               causal=self.attn_type == AttnType.DECODER,
                               scale=scale)


class PallasEncoderAttnBackend(EncoderAttnBackend):
    name = "pallas"

    # XLA's fused dense attention beats the Pallas flash kernel when the
    # head_dim is below the 128-lane tile (the kernel pads d 64->128,
    # doubling every operand and the PV dot) AND the materialized
    # [B, h, L, L] score block stays small: measured on v5e at the
    # BGE-M3 encode shape (B=64, L=512, h=16, d=64) the flash path runs
    # the 24-layer forward at 562 ms vs 270 ms dense — e2e 57k vs 116k
    # tok/s. Above the budget (long L) or at d>=128, flash wins.
    DENSE_SCORE_BUDGET = 2 << 30  # bytes of [B, h, L, L] bf16

    def __init__(self, attn_type: AttnType) -> None:
        super().__init__(attn_type)
        # Interpret mode runs the kernel as jax ops — CPU-mesh tests.
        self.interpret = not current_platform().is_tpu

    def __call__(self, q, k, v, mask, *, scale=None):
        from light_vllm_tpu.ops.attention_ref import dense_attention
        from light_vllm_tpu.ops.flash_attention import flash_attention_dense

        B, L, h, d = q.shape
        if d < 128 and B * h * L * L * 2 <= self.DENSE_SCORE_BUDGET:
            return dense_attention(
                q, k, v, mask.astype(bool),
                causal=self.attn_type == AttnType.DECODER, scale=scale)
        return flash_attention_dense(
            q, k, v, mask, causal=self.attn_type == AttnType.DECODER,
            scale=scale, interpret=self.interpret)


def get_attn_backend(attn_type: AttnType) -> EncoderAttnBackend:
    choice = envs.LVT_ATTENTION_BACKEND
    if choice is None:
        choice = "pallas" if current_platform().is_tpu else "reference"
    if choice == "pallas":
        return PallasEncoderAttnBackend(attn_type)
    if choice in ("reference", "naive"):
        return EncoderAttnBackend(attn_type)
    raise ValueError(f"unknown attention backend {choice!r}")
