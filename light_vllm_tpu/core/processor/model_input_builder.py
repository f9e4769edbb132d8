"""ModelInputBuilder ABC (reference: light_vllm/core/processor/model_input_builder.py:8)."""

from abc import ABC, abstractmethod

from light_vllm_tpu.core.schema.engine_io import SchedulerOutput
from light_vllm_tpu.core.schema.execute_io import ExecuteInput


class ModelInputBuilder(ABC):
    """SchedulerOutput → ExecuteInput (dense padded arrays + worker commands).

    On TPU this is where dynamic batches meet XLA's static shapes: builders
    pad token/sequence counts up to a small set of buckets so the jitted step
    function compiles once per bucket.
    """

    @classmethod
    def from_engine(cls, engine) -> "ModelInputBuilder":
        return cls()

    @abstractmethod
    def __call__(self, scheduler_output: SchedulerOutput) -> ExecuteInput:
        ...
