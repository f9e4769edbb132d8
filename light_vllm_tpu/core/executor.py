"""Execution engines: sync call-through and async in-flight pipelines.

TPU re-design of the reference's stream-pool executor ("FrierenExecutor",
reference: light_vllm/core/executor.py:14-186). On TPU, XLA's async dispatch
replaces CUDA streams: calling the jitted step returns immediately with
device futures, and ops on one device execute in dispatch order. What is left
for the executor to overlap is *host* work — input building, sampling-state
pythonization, detokenization — which we do with the same queue-fed daemon
thread design as the reference, minus the stream pool:

  - sync: execute on the caller thread; the output processor later blocks on
    device_get of the (tiny) sampled-token arrays.
  - async ("simple_async"): a daemon thread pulls ExecuteInputs off a queue,
    dispatches to the worker, and pushes device futures to the out queue.
    The engine keeps up to `max_num_on_the_fly` batches in flight, so the
    host builds batch N+1 while the device runs batch N.
  - double_buffer: additionally pre-transfers batch N+1's inputs to device
    while batch N computes (jax.device_put is itself async, so this mostly
    helps when inputs are large, e.g. long prefill).
"""

import queue
import threading
import time
import traceback
from typing import Optional

from light_vllm_tpu.core.schema.execute_io import ExecuteInput, ExecuteOutput
from light_vllm_tpu.core.worker import WorkerBase
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


class ExecutorError(RuntimeError):
    pass


class Executor:
    """Synchronous executor."""

    support_scheduling = ["sync_scheduling"]

    def __init__(self, worker: WorkerBase) -> None:
        self.worker = worker

    def execute_model(self, execute_input: ExecuteInput) -> ExecuteOutput:
        out = self.worker(execute_input)
        out.start_readback()
        return out

    def shutdown_execute_loop(self) -> None:
        pass


class AsyncExecutor(Executor):
    """Queue-fed daemon-thread executor for async scheduling."""

    support_scheduling = ["async_scheduling"]

    def __init__(self, worker: WorkerBase, executor_in: "queue.Queue",
                 executor_out: "queue.Queue") -> None:
        super().__init__(worker)
        self.executor_in = executor_in
        self.executor_out = executor_out
        self.executor_thread: Optional[threading.Thread] = None

    def ensure_start_execute_loop(self) -> None:
        if self.executor_thread is None or not self.executor_thread.is_alive():
            self.executor_thread = threading.Thread(
                target=self._execute_loop, name="lvt-executor", daemon=True)
            self.executor_thread.start()

    def _execute_loop(self) -> None:
        while True:
            item = self.executor_in.get()
            if item is None:
                return
            tag, execute_input = item
            try:
                out = self.worker(execute_input)
                out.start_readback()
                self.executor_out.put((tag, out))
            except Exception as e:  # ferry exceptions to the engine thread
                logger.error("executor thread error: %s\n%s", e,
                             traceback.format_exc())
                self.executor_out.put((tag, e))

    def shutdown_execute_loop(self) -> None:
        if self.executor_thread is not None and self.executor_thread.is_alive():
            self.executor_in.put(None)
            self.executor_thread.join(timeout=5.0)
            self.executor_thread = None


class DoubleBufferExecutor(AsyncExecutor):
    """Async executor that additionally pre-stages batch N+1's host→device
    transfer while batch N computes (reference: core/executor.py:95
    double_buffer_execute_loop — its second CUDA stream becomes an async
    jax.device_put here: the transfer engine runs it concurrently with the
    step executable, so the h2d latency of large prefill blobs leaves the
    step critical path)."""

    def _execute_loop(self) -> None:
        staged = None  # (tag, execute_input) with inputs already on device
        shutdown = False
        while True:
            if staged is None:
                item = self.executor_in.get()
                if item is None:
                    return
                staged = self._stage(item)
            tag, execute_input = staged
            staged = None
            # Opportunistically start the NEXT batch's h2d before running
            # this one: device_put is async, so the copy overlaps compute.
            try:
                nxt = self.executor_in.get_nowait()
                if nxt is None:
                    shutdown = True
                else:
                    staged = self._stage(nxt)
            except queue.Empty:
                pass
            try:
                out = self.worker(execute_input)
                out.start_readback()
                self.executor_out.put((tag, out))
            except Exception as e:  # ferry exceptions to the engine thread
                logger.error("executor thread error: %s\n%s", e,
                             traceback.format_exc())
                self.executor_out.put((tag, e))
            if shutdown:
                return

    def _stage(self, item):
        tag, execute_input = item
        try:
            pre = getattr(self.worker, "pre_transfer", None)
            if pre is not None:
                execute_input = pre(execute_input)
        except Exception:
            # Staging is an optimization; the worker transfer path still
            # handles host arrays.
            logger.warning("double-buffer pre-transfer failed; falling "
                           "back to dispatch-time h2d", exc_info=True)
        return (tag, execute_input)
