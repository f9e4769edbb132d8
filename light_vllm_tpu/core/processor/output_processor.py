"""OutputProcessor ABC (reference: light_vllm/core/processor/output_processor.py:10)."""

from abc import ABC, abstractmethod
from typing import List

from light_vllm_tpu.core.schema.engine_io import SchedulerOutput
from light_vllm_tpu.core.schema.execute_io import ExecuteOutput


class OutputProcessor(ABC):
    """(SchedulerOutput, ExecuteOutput) → list of user-facing outputs."""

    @classmethod
    def from_engine(cls, engine) -> "OutputProcessor":
        return cls()

    @abstractmethod
    def __call__(self, scheduler_output: SchedulerOutput,
                 execute_output: ExecuteOutput) -> List:
        ...
