"""Decoding engine args (reference: light_vllm/decoding/arg_utils.py:21-62)."""

from dataclasses import dataclass
from typing import Optional

from light_vllm_tpu.core.arg_utils import EngineArgs
from light_vllm_tpu.core.config import (CacheConfig, DeviceConfig, LoadConfig,
                                        ModelConfig, ParallelConfig)
from light_vllm_tpu.decoding.config import (DecodingEngineConfig,
                                            DecodingSchedulerConfig)


def _cache_level_sliding_window(model_config) -> Optional[int]:
    """Window size for *cache-level* block rotation, or None.

    Only models that apply the window on EVERY layer may rotate/reuse KV
    blocks past the window at the cache level (Mistral-style). Interleaved
    models (Gemma2: window on even layers, global on odd) must keep the
    full context resident — their global layers read all of it — and apply
    the window per-layer inside attention only (the model class declares
    `interleaved_sliding_window = True`; upstream analog: vLLM disables
    cache-level sliding window for interleaved attention).
    """
    window = getattr(model_config.hf_config, "sliding_window", None)
    if window is None:
        return None
    try:
        from light_vllm_tpu.core.registry import ModelRegistry
        from light_vllm_tpu.core.workflow import lazy_import

        model_cls = lazy_import(
            ModelRegistry.get_model_path(model_config.architectures))
        if getattr(model_cls, "interleaved_sliding_window", False):
            return None
    except Exception:  # unknown arch: keep conservative full-context cache
        return None
    return window


@dataclass
class DecodingEngineArgs(EngineArgs):
    # KV cache
    block_size: int = 16
    kv_cache_dtype: str = "auto"
    swap_space: float = 4.0  # GiB of host swap
    hbm_utilization: float = 0.9
    num_device_blocks_override: Optional[int] = None
    enable_prefix_caching: bool = False
    # scheduler
    max_num_seqs: int = 256
    max_num_batched_tokens: Optional[int] = None
    enable_chunked_prefill: bool = False
    preemption_mode: Optional[str] = None
    scheduling: str = "sync"
    max_num_on_the_fly: Optional[int] = None
    num_scheduler_steps: int = 1
    # sidecar JSON with per-layer KV-cache scales (reference:
    # kv_cache_scales_loader)
    quantization_param_path: Optional[str] = None
    # rope overrides
    rope_scaling: Optional[dict] = None
    rope_theta: Optional[float] = None

    def create_engine_config(self) -> DecodingEngineConfig:
        model_config = ModelConfig(
            model=self.model, tokenizer=self.tokenizer, dtype=self.dtype,
            seed=self.seed, trust_remote_code=self.trust_remote_code,
            revision=self.revision, max_model_len=self.max_model_len,
            quantization=self.quantization,
            quantization_param_path=self.quantization_param_path,
            rope_scaling=self.rope_scaling,
            rope_theta=self.rope_theta, hf_config=self.hf_config)
        cache_config = CacheConfig(
            block_size=self.block_size,
            hbm_utilization=self.hbm_utilization,
            swap_space_gb=self.swap_space,
            cache_dtype=self.kv_cache_dtype,
            enable_prefix_caching=self.enable_prefix_caching,
            num_device_blocks_override=self.num_device_blocks_override,
            sliding_window=_cache_level_sliding_window(model_config))
        scheduler_config = DecodingSchedulerConfig(
            max_num_requests=self.max_num_seqs,
            max_model_len=model_config.max_model_len,
            max_num_batched_tokens=self.max_num_batched_tokens,
            enable_chunked_prefill=self.enable_chunked_prefill,
            preemption_mode=self.preemption_mode,
            scheduling=self.scheduling,
            max_num_on_the_fly=self.max_num_on_the_fly,
            num_scheduler_steps=self.num_scheduler_steps)
        return DecodingEngineConfig(
            model_config=model_config,
            cache_config=cache_config,
            scheduler_config=scheduler_config,
            device_config=DeviceConfig(),
            load_config=LoadConfig(load_format=self.load_format,
                                   download_dir=self.download_dir,
                                   state_dict=self.state_dict),
            parallel_config=ParallelConfig(
                tensor_parallel_size=self.tensor_parallel_size,
                data_parallel_size=self.data_parallel_size,
                devices=self.devices))
