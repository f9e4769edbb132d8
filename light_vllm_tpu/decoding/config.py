"""Decoding configs (reference: light_vllm/decoding/config.py:31-240)."""

from dataclasses import dataclass, field
from typing import Optional

from light_vllm_tpu.core.config import (CacheConfig, DeviceConfig,
                                        EngineConfig, LoadConfig, ModelConfig,
                                        ParallelConfig, SchedulerConfig)

_SUPPORTED_SCHEDULING = ("sync", "simple_async", "async", "double_buffer")


@dataclass
class DecodingSchedulerConfig(SchedulerConfig):
    """Continuous-batching knobs (reference: decoding/config.py:119).

    max_num_batched_tokens: per-step token budget; with chunked prefill the
    default drops to 512 so prefills interleave with decodes.
    """

    max_num_requests: int = 256
    max_model_len: int = 4096
    max_num_batched_tokens: Optional[int] = None
    enable_chunked_prefill: bool = False
    preemption_mode: Optional[str] = None  # "recompute" | "swap" | None=auto
    scheduling: str = "sync"
    max_num_on_the_fly: Optional[int] = None
    # Multi-step decode: run up to K decode iterations inside one device
    # dispatch (lax.scan feeding sampled tokens device-side) — the TPU
    # analog of the reference's advance_step multi-step path (reference:
    # csrc/prepare_inputs/advance_step.cu). Amortizes per-step host and
    # interconnect latency by K.
    num_scheduler_steps: int = 1

    def __post_init__(self):
        if self.max_num_batched_tokens is None:
            if self.enable_chunked_prefill:
                self.max_num_batched_tokens = 512
            else:
                self.max_num_batched_tokens = max(self.max_model_len, 2048)
        if not self.enable_chunked_prefill:
            self.max_num_batched_tokens = max(self.max_num_batched_tokens,
                                              self.max_model_len)
        if self.scheduling not in _SUPPORTED_SCHEDULING:
            raise ValueError(f"scheduling must be one of "
                             f"{_SUPPORTED_SCHEDULING}")
        if self.max_num_on_the_fly is None:
            self.max_num_on_the_fly = \
                3 if self.scheduling == "double_buffer" else 2

    @property
    def max_num_seqs(self) -> int:
        return self.max_num_requests


@dataclass
class ChatModelConfig(ModelConfig):
    pass


@dataclass
class DecodingEngineConfig(EngineConfig):
    cache_config: Optional[CacheConfig] = None
