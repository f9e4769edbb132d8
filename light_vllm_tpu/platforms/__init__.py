"""Platform probe: which JAX backend are we on?

Counterpart of the reference's platform layer (reference:
light_vllm/platforms/interface.py, light_vllm/platforms/cuda.py), but TPU/CPU.
"""

import enum
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Tuple

from light_vllm_tpu import envs


class PlatformEnum(enum.Enum):
    TPU = enum.auto()
    CPU = enum.auto()
    OTHER = enum.auto()


@dataclass
class Platform:
    kind: PlatformEnum
    device_kind: str
    num_devices: int

    @property
    def is_tpu(self) -> bool:
        return self.kind == PlatformEnum.TPU

    @property
    def is_cpu(self) -> bool:
        return self.kind == PlatformEnum.CPU

    def hbm_bytes(self) -> Optional[int]:
        """Total device memory per chip, if the backend reports it."""
        import jax

        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "bytes_limit" in stats:
                return int(stats["bytes_limit"])
        except Exception:
            pass
        if self.is_tpu:
            # v5e has 16 GiB HBM; conservative default when stats are missing.
            return 16 * 1024**3
        return None


@lru_cache(maxsize=1)
def detect_platform() -> Platform:
    import jax

    forced = envs.LVT_PLATFORM
    devices = jax.devices()
    kind_str = devices[0].platform.lower()
    if forced == "cpu":
        kind = PlatformEnum.CPU
    elif forced == "tpu" or kind_str in ("tpu", "axon"):
        kind = PlatformEnum.TPU
    elif kind_str == "cpu":
        kind = PlatformEnum.CPU
    else:
        kind = PlatformEnum.OTHER
    return Platform(kind=kind, device_kind=devices[0].device_kind,
                    num_devices=len(devices))


def current_platform() -> Platform:
    return detect_platform()
