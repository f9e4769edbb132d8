"""Prefill-only schemas (reference: light_vllm/prefill_only/schema/)."""

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from light_vllm_tpu.core.schema.engine_io import (Params, Request,
                                                  SchedulableRequest,
                                                  SchedulerOutput,
                                                  TextOnlyInputs)
from light_vllm_tpu.core.schema.execute_io import (ExecuteOutput, ModelInput,
                                                   WorkerInput)


@dataclass
class TextSchedulableRequest(SchedulableRequest):
    inputs: Optional[TextOnlyInputs] = None
    params: Optional[Params] = None

    def num_new_tokens(self) -> int:
        return len(self.inputs.prompt_token_ids)


@dataclass
class PrefillOnlySchedulerOutput(SchedulerOutput):
    scheduled_requests: List[TextSchedulableRequest] = field(
        default_factory=list)
    ignored_requests: List[Request] = field(default_factory=list)

    def is_empty(self) -> bool:
        # Ignored (over-length) requests still need their finished/None
        # outputs emitted — a step with only ignored requests is NOT empty
        # (improves on reference prefill_only/schema/engine_io.py:36-37,
        # which silently drops an ignored-only batch).
        return not self.scheduled_requests and not self.ignored_requests

    def needs_execution(self) -> bool:
        return bool(self.scheduled_requests)


@dataclass
class ModelInputForEncoder(ModelInput):
    """Dense padded batch for encoder-style forward passes.

    input_ids/positions/token_type_ids: [B, L]; mask: [B, L] (1 = real).
    B and L are bucketed so the jitted forward compiles a handful of times.
    """

    input_ids: np.ndarray = None
    positions: np.ndarray = None
    mask: np.ndarray = None
    token_type_ids: Optional[np.ndarray] = None
    num_real_requests: int = 0
    seq_lens: Optional[np.ndarray] = None


@dataclass
class PrefillOnlyWorkerInput(WorkerInput):
    pass


@dataclass
class PrefillOnlyExecuteOutput(ExecuteOutput):
    """hidden_states: [B, L, H] device array; pooled: optional [B, H];
    dense_vecs: optional [B, H] float32 pooled-and-normalized embeddings
    computed ON DEVICE inside the jitted forward.

    dense_vecs exists so the retriever/embedder paths never ship the full
    [B, L, H] hidden block to host: at BGE-M3 shape (64×512×1024) that is
    ~134 MB per batch over the device link vs 256 KB for the vectors —
    measured as the difference between 10.4k and >40k tok/s on the encode
    leg (r4→r5)."""

    hidden_states: Optional[object] = None
    pooled_output: Optional[object] = None
    dense_vecs: Optional[object] = None
