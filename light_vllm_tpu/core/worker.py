"""Worker base + lazy wrapper.

Counterpart of the reference's worker layer (reference:
light_vllm/core/worker.py:14-113). A worker owns device state (weights, KV
pages, the jitted step functions) and turns an ExecuteInput into an
ExecuteOutput. On TPU there is no per-worker CUDA_VISIBLE_DEVICES dance —
device placement is expressed through the jax.sharding.Mesh the worker builds.
"""

import importlib
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

from light_vllm_tpu.core.schema.execute_io import ExecuteInput, ExecuteOutput
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


class WorkerBase(ABC):

    @abstractmethod
    def init_device(self) -> None:
        """Build the mesh / pick devices; first point that touches hardware."""

    @abstractmethod
    def load_model(self) -> None:
        ...

    @abstractmethod
    def __call__(self, execute_input: ExecuteInput) -> ExecuteOutput:
        ...

    def shutdown(self) -> None:
        """Release device buffers (drop references; XLA frees async)."""


class WorkerWrapperBase:
    """Lazily import and construct a worker class by string
    (reference: light_vllm/core/worker.py:29)."""

    def __init__(self, worker_qualname: str, **kwargs) -> None:
        self.worker_qualname = worker_qualname
        self.kwargs = kwargs
        self.worker: Optional[WorkerBase] = None

    def init_worker(self, **extra) -> WorkerBase:
        module_name, _, class_name = self.worker_qualname.partition(":")
        mod = importlib.import_module(module_name)
        cls = getattr(mod, class_name)
        self.worker = cls(**{**self.kwargs, **extra})
        return self.worker

    def __getattr__(self, item):
        return getattr(self.worker, item)


def create_worker(worker_qualname: str, **kwargs) -> WorkerBase:
    wrapper = WorkerWrapperBase(worker_qualname, **kwargs)
    return wrapper.init_worker()
