"""Decoding executors + KV-cache initialization dance.

(reference: light_vllm/decoding/executor/gpu_executor.py:27-157)
"""

from light_vllm_tpu.core.executor import (AsyncExecutor,
                                          DoubleBufferExecutor, Executor)
from light_vllm_tpu.core.workflow import lazy_import
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _build_worker(engine):
    worker_cls = lazy_import(engine.workflow.Worker)
    return worker_cls.from_engine(engine)


class _KVInitMixin:

    def initialize_kv_caches(self, engine) -> None:
        """Size the paged cache then allocate it
        (reference: gpu_executor.py:83-107)."""
        cc = engine.engine_config.cache_config
        num_device, num_cpu = self.worker.determine_num_available_blocks()
        cc.num_device_blocks = num_device
        cc.num_cpu_blocks = num_cpu
        self.worker.initialize_cache(num_device, num_cpu)


class DecodingExecutor(_KVInitMixin, Executor):

    @classmethod
    def from_engine(cls, engine) -> "DecodingExecutor":
        return cls(_build_worker(engine))


class DecodingAsyncExecutor(_KVInitMixin, AsyncExecutor):

    @classmethod
    def from_engine(cls, engine) -> "DecodingAsyncExecutor":
        return cls(_build_worker(engine), engine.executor_in,
                   engine.executor_out)


class DecodingDoubleBufferExecutor(_KVInitMixin, DoubleBufferExecutor):

    @classmethod
    def from_engine(cls, engine) -> "DecodingDoubleBufferExecutor":
        return cls(_build_worker(engine), engine.executor_in,
                   engine.executor_out)
