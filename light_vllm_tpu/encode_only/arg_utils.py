"""Encode-only engine args (reference: light_vllm/encode_only/arg_utils.py)."""

from dataclasses import dataclass
from typing import Optional

from light_vllm_tpu.core.arg_utils import EngineArgs
from light_vllm_tpu.core.config import (DeviceConfig, EngineConfig, LoadConfig,
                                        ModelConfig, ParallelConfig)
from light_vllm_tpu.prefill_only.config import PrefillOnlySchedulerConfig


@dataclass
class EncodeOnlyEngineArgs(EngineArgs):
    max_num_requests: int = 64
    max_num_batched_tokens: Optional[int] = None
    scheduling: str = "sync"
    max_num_on_the_fly: int = 2

    def create_engine_config(self) -> EngineConfig:
        model_config = ModelConfig(
            model=self.model, tokenizer=self.tokenizer, dtype=self.dtype,
            seed=self.seed, trust_remote_code=self.trust_remote_code,
            revision=self.revision, max_model_len=self.max_model_len,
            quantization=self.quantization, hf_config=self.hf_config)
        scheduler_config = PrefillOnlySchedulerConfig(
            max_num_requests=self.max_num_requests,
            max_model_len=model_config.max_model_len,
            max_num_batched_tokens=self.max_num_batched_tokens,
            scheduling=self.scheduling,
            max_num_on_the_fly=self.max_num_on_the_fly)
        return EngineConfig(
            model_config=model_config,
            device_config=DeviceConfig(),
            load_config=LoadConfig(load_format=self.load_format,
                                   download_dir=self.download_dir,
                                   state_dict=self.state_dict),
            scheduler_config=scheduler_config,
            parallel_config=ParallelConfig(
                tensor_parallel_size=self.tensor_parallel_size,
                data_parallel_size=self.data_parallel_size))
