"""Base EngineArgs dataclass (reference: light_vllm/core/arg_utils.py:16-31)."""

from dataclasses import asdict, dataclass
from typing import Any, Dict, Optional, Union


@dataclass
class EngineArgs:
    model: str = ""
    tokenizer: Optional[str] = None
    dtype: str = "auto"
    seed: int = 0
    trust_remote_code: bool = False
    revision: Optional[str] = None
    max_model_len: Optional[int] = None
    download_dir: Optional[str] = None
    load_format: str = "auto"
    quantization: Optional[str] = None
    # Offline-test escape hatch: direct HF config + state dict.
    hf_config: Optional[Any] = None
    state_dict: Optional[Dict[str, Any]] = None
    # Parallelism
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # Explicit device subset (replica pinning for engine-level DP — see
    # entrypoints/dp_llm.py; reference analog:
    # prefill_only/executor/gpu_data_parallelism_executor.py per-device
    # workers). None = all visible devices.
    devices: Optional[Any] = None

    def to_dict(self) -> Dict[str, Any]:
        d = {}
        for k, v in self.__dict__.items():
            d[k] = v
        return d

    def create_engine_config(self):
        raise NotImplementedError
