"""Prefill-only configs (reference: light_vllm/prefill_only/config.py:11-90)."""

from dataclasses import dataclass
from typing import Optional

from light_vllm_tpu.core.config import SchedulerConfig


@dataclass
class PrefillOnlySchedulerConfig(SchedulerConfig):
    max_num_requests: int = 64
    max_model_len: int = 512
    max_num_batched_tokens: Optional[int] = None
    scheduling: str = "sync"  # "sync" | "async" | "double_buffer"
    max_num_on_the_fly: int = 2

    def __post_init__(self):
        if self.max_num_batched_tokens is None:
            self.max_num_batched_tokens = \
                self.max_model_len * self.max_num_requests


@dataclass
class PrefillOnlyParallelConfig:
    """Data-parallel fleet for encode workloads (reference:
    light_vllm/prefill_only/config.py:78): on TPU this becomes a "dp" mesh
    axis — each DP shard runs the same jitted forward on its slice of the
    batch."""

    data_parallel_size: int = 1
