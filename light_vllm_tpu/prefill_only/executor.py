"""Prefill-only executors (reference: light_vllm/prefill_only/executor/).

Sync, async (queue-fed daemon thread), and data-parallel variants. The DP
executor keeps the reference's shape — N workers fed from one shared queue —
but each worker pins a distinct TPU chip via a single-device Mesh
(reference: prefill_only/executor/gpu_data_parallelism_executor.py:17-81 used
per-thread CUDA_VISIBLE_DEVICES instead).
"""

import queue
import threading
import traceback
from typing import List, Optional

from light_vllm_tpu.core.executor import AsyncExecutor, Executor
from light_vllm_tpu.core.workflow import lazy_import
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _build_worker(engine):
    worker_cls = lazy_import(engine.workflow.Worker)
    return worker_cls.from_engine(engine)


class PrefillOnlyExecutor(Executor):

    @classmethod
    def from_engine(cls, engine) -> "PrefillOnlyExecutor":
        return cls(_build_worker(engine))


class PrefillOnlyAsyncExecutor(AsyncExecutor):

    @classmethod
    def from_engine(cls, engine) -> "PrefillOnlyAsyncExecutor":
        return cls(_build_worker(engine), engine.executor_in,
                   engine.executor_out)


class PrefillOnlyDataParallelExecutor(Executor):
    """N single-chip workers, one shared in-queue, daemon threads."""

    support_scheduling = ["async_scheduling"]

    def __init__(self, workers: List, executor_in: "queue.Queue",
                 executor_out: "queue.Queue") -> None:
        self.workers = workers
        self.executor_in = executor_in
        self.executor_out = executor_out
        self.threads: Optional[List[threading.Thread]] = None

    @classmethod
    def from_engine(cls, engine) -> "PrefillOnlyDataParallelExecutor":
        import jax

        dp = engine.engine_config.parallel_config.data_parallel_size
        devices = jax.devices()
        if dp > len(devices):
            raise ValueError(f"dp={dp} > {len(devices)} devices")
        worker_cls = lazy_import(engine.workflow.Worker)
        workers = []
        for rank in range(dp):
            worker = worker_cls.from_engine_with_device(engine,
                                                        devices[rank])
            workers.append(worker)
        return cls(workers, engine.executor_in, engine.executor_out)

    def ensure_start_execute_loop(self) -> None:
        if self.threads is None:
            self.threads = []
            for rank, worker in enumerate(self.workers):
                t = threading.Thread(target=self._loop, args=(worker,),
                                     name=f"lvt-dp-worker-{rank}",
                                     daemon=True)
                t.start()
                self.threads.append(t)

    def _loop(self, worker) -> None:
        while True:
            item = self.executor_in.get()
            if item is None:
                self.executor_in.put(None)  # let siblings exit too
                return
            tag, execute_input = item
            try:
                out = worker(execute_input)
                out.block_until_ready()  # keep per-chip ordering visible
                self.executor_out.put((tag, out))
            except Exception as e:
                logger.error("dp worker error: %s\n%s", e,
                             traceback.format_exc())
                self.executor_out.put((tag, e))

    def shutdown_execute_loop(self) -> None:
        if self.threads:
            self.executor_in.put(None)
            for t in self.threads:
                t.join(timeout=5.0)
            self.threads = None
