"""Engine configuration tree.

Counterpart of the reference's config tree (reference:
light_vllm/core/config.py: DeviceConfig:22, LoadConfig:66, CacheConfig:128,
ModelConfig:205, EngineConfig:703), redesigned around JAX: devices come from a
Mesh, dtypes are jnp dtypes, and parallelism is a first-class config.
"""

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

import jax.numpy as jnp

from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

_STR_DTYPE_TO_JNP = {
    "half": jnp.bfloat16,  # fp16 has no MXU benefit on TPU; map to bf16
    "float16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "float": jnp.float32,
    "float32": jnp.float32,
    "fp8": jnp.float8_e4m3fn,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
    "auto": None,
}


def resolve_dtype(dtype: Union[str, Any], default=jnp.bfloat16):
    if dtype is None:
        return default
    # torch.dtype objects / "torch.float32" strings come from HF config
    # torch_dtype fields (reference: config.py _get_and_verify_dtype).
    if type(dtype).__module__ == "torch":
        dtype = str(dtype)
    if isinstance(dtype, str):
        dtype = dtype.removeprefix("torch.")
        if dtype not in _STR_DTYPE_TO_JNP:
            raise ValueError(f"unknown dtype {dtype!r}")
        out = _STR_DTYPE_TO_JNP[dtype]
        return default if out is None else out
    return dtype


def filter_unexpected_fields(cls):
    """Decorator: drop unknown kwargs instead of raising
    (reference: light_vllm/core/config.py:750-761)."""
    original_init = cls.__init__

    def new_init(self, **kwargs):
        known = {f.name for f in dataclasses.fields(cls)}
        dropped = {k: v for k, v in kwargs.items() if k not in known}
        if dropped:
            logger.debug("dropping unexpected config fields: %s",
                         sorted(dropped))
        original_init(self, **{k: v for k, v in kwargs.items() if k in known})

    cls.__init__ = new_init
    return cls


@dataclass
class DeviceConfig:
    """Which JAX backend to run on ("auto" | "tpu" | "cpu")."""

    device: str = "auto"

    def __post_init__(self):
        if self.device == "auto":
            from light_vllm_tpu.platforms import current_platform

            self.device = "tpu" if current_platform().is_tpu else "cpu"


@dataclass
class LoadConfig:
    """How weights are materialized (reference: light_vllm/core/config.py:66).

    load_format: "auto" | "safetensors" | "dummy" | "hf_state_dict"
    """

    load_format: str = "auto"
    download_dir: Optional[str] = None
    # For tests: a ready {name: np.ndarray} state dict.
    state_dict: Optional[Dict[str, Any]] = None


@dataclass
class CacheConfig:
    """Paged KV-cache sizing (reference: light_vllm/core/config.py:128).

    On TPU "gpu_memory_utilization" becomes hbm_utilization; swap space is
    host RAM holding swapped-out pages.
    """

    block_size: int = 16
    hbm_utilization: float = 0.9
    swap_space_gb: float = 4.0
    cache_dtype: str = "auto"  # "auto" | "fp8" | "fp8_e5m2"
    enable_prefix_caching: bool = False
    num_device_blocks_override: Optional[int] = None
    num_device_blocks: Optional[int] = None
    num_cpu_blocks: Optional[int] = None
    sliding_window: Optional[int] = None

    def __post_init__(self):
        if self.block_size & (self.block_size - 1):
            raise ValueError("block_size must be a power of two")

    @property
    def cache_jnp_dtype(self):
        if self.cache_dtype in ("auto", None):
            return None  # follow model dtype
        return resolve_dtype(self.cache_dtype)

    def metrics_info(self) -> Dict[str, str]:
        return {k: str(v) for k, v in dataclasses.asdict(self).items()}


@dataclass
class ParallelConfig:
    """Device-mesh layout. TP shards weights/KV-heads over the "model" axis,
    DP shards request batches over the "data" axis. On a multi-host slice the
    data axis should map to DCN and the model axis to ICI.
    """

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # Advanced: explicit device order for mesh construction.
    devices: Optional[List[Any]] = None

    @property
    def world_size(self) -> int:
        return self.tensor_parallel_size * self.data_parallel_size


@dataclass
class SchedulerConfig:
    """Base scheduler knobs; task workflows subclass with their own."""

    max_num_requests: int = 256
    max_model_len: int = 4096

    @property
    def max_num_seqs(self) -> int:
        return self.max_num_requests


class ModelConfig:
    """Model identity + resolved HF config + dtype policy
    (reference: light_vllm/core/config.py:205).

    `model` may be an HF repo id, a local path, or "" when `hf_config` (a
    transformers PretrainedConfig or plain dict) is supplied directly —
    the latter keeps tests offline.
    """

    def __init__(
        self,
        model: str = "",
        tokenizer: Optional[str] = None,
        dtype: Union[str, Any] = "auto",
        seed: int = 0,
        trust_remote_code: bool = False,
        revision: Optional[str] = None,
        max_model_len: Optional[int] = None,
        quantization: Optional[str] = None,
        quantization_param_path: Optional[str] = None,
        rope_scaling: Optional[dict] = None,
        rope_theta: Optional[float] = None,
        hf_config: Optional[Any] = None,
        served_model_name: Optional[str] = None,
    ) -> None:
        self.model = model
        self.tokenizer = tokenizer or model
        self.seed = seed
        self.trust_remote_code = trust_remote_code
        self.revision = revision
        self.quantization = quantization
        # Sidecar JSON with per-layer KV-cache scaling factors (reference:
        # weight_utils.py:411-450 kv_cache_scales_loader).
        self.quantization_param_path = quantization_param_path
        self.served_model_name = served_model_name or model

        if hf_config is None:
            from light_vllm_tpu.core.loader.hf_utils import get_hf_config

            hf_config = get_hf_config(model, trust_remote_code=trust_remote_code,
                                      revision=revision)
        if isinstance(hf_config, dict):
            hf_config = _DictConfig(hf_config)
        self.hf_config = hf_config

        if rope_scaling is not None:
            self.hf_config.rope_scaling = rope_scaling
        if rope_theta is not None:
            self.hf_config.rope_theta = rope_theta

        torch_dtype = getattr(hf_config, "torch_dtype", None)
        self.dtype = resolve_dtype(
            dtype, default=resolve_dtype(str(torch_dtype) if torch_dtype
                                         else "bfloat16"))
        self.max_model_len = self._resolve_max_model_len(max_model_len)

        # Prequantized checkpoint (GPTQ/AWQ/fp8) auto-detection from the HF
        # quantization_config (reference: weight_utils.py:119 get_quant_config).
        self.quantization_kwargs: dict = {}
        if self.quantization is None:
            from light_vllm_tpu.layers.quant.ingest import \
                detect_hf_quantization

            detected = detect_hf_quantization(self.hf_config)
            if detected:
                self.quantization = detected.pop("name")
                self.quantization_kwargs = detected
                logger.info("detected prequantized checkpoint: %s %s",
                            self.quantization, self.quantization_kwargs)

    def _resolve_max_model_len(self, user_len: Optional[int]) -> int:
        derived = None
        for key in ("max_position_embeddings", "n_positions",
                    "max_seq_len", "seq_length"):
            v = getattr(self.hf_config, key, None)
            if v is not None:
                derived = int(v)
                break
        if user_len is None:
            return derived or 4096
        if derived is not None and user_len > derived:
            logger.warning(
                "max_model_len %d exceeds model's trained length %d",
                user_len, derived)
        return user_len

    # --- architecture helpers ---------------------------------------------
    @property
    def architectures(self) -> List[str]:
        return list(getattr(self.hf_config, "architectures", []) or [])

    def get_hidden_size(self) -> int:
        return int(self.hf_config.hidden_size)

    def get_head_size(self) -> int:
        if getattr(self.hf_config, "head_dim", None):
            return int(self.hf_config.head_dim)
        return self.get_hidden_size() // self.get_num_attention_heads()

    def get_num_attention_heads(self) -> int:
        return int(self.hf_config.num_attention_heads)

    def get_num_kv_heads(self) -> int:
        v = getattr(self.hf_config, "num_key_value_heads", None)
        return int(v) if v is not None else self.get_num_attention_heads()

    def get_num_layers(self) -> int:
        for key in ("num_hidden_layers", "n_layer", "num_layers"):
            v = getattr(self.hf_config, key, None)
            if v is not None:
                return int(v)
        raise ValueError("cannot determine number of layers from hf_config")

    def get_vocab_size(self) -> int:
        return int(self.hf_config.vocab_size)


class _DictConfig:
    """Minimal attribute view over a plain dict config."""

    def __init__(self, d: Dict[str, Any]):
        self.__dict__.update(d)

    def __getattr__(self, name):
        return None

    def to_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)


@dataclass
class EngineConfig:
    """The composite handed to every component
    (reference: light_vllm/core/config.py:703)."""

    model_config: ModelConfig
    device_config: DeviceConfig = field(default_factory=DeviceConfig)
    load_config: LoadConfig = field(default_factory=LoadConfig)
    scheduler_config: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel_config: ParallelConfig = field(default_factory=ParallelConfig)
    cache_config: Optional[CacheConfig] = None

    def log_config(self) -> None:
        logger.info(
            "engine config: model=%r dtype=%s max_model_len=%d tp=%d dp=%d "
            "device=%s",
            self.model_config.model, self.model_config.dtype,
            self.model_config.max_model_len,
            self.parallel_config.tensor_parallel_size,
            self.parallel_config.data_parallel_size,
            self.device_config.device)

    def to_dict(self) -> Dict[str, Any]:
        return {"model": self.model_config.model}
