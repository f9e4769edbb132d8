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

    def __init__(self, attn_type: AttnType) -> None:
        super().__init__(attn_type)
        # Interpret mode runs the kernel as jax ops — CPU-mesh tests.
        self.interpret = not current_platform().is_tpu

    def __call__(self, q, k, v, mask, *, scale=None):
        from light_vllm_tpu.ops.flash_attention import flash_attention_dense

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
