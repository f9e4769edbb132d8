"""Prefill-only processors: request tokenization + model-input building.

(reference: light_vllm/prefill_only/processor/model_input_builder.py:15-52,
light_vllm/core/processor/input_processor.py:97)
"""

from typing import Optional

import numpy as np

from light_vllm_tpu.core.processor.input_processor import RequestProcessor
from light_vllm_tpu.core.schema.engine_io import TextRequest
from light_vllm_tpu.core.processor.model_input_builder import ModelInputBuilder
from light_vllm_tpu.core.schema.execute_io import ExecuteInput
from light_vllm_tpu.prefill_only.schema import (ModelInputForEncoder,
                                                PrefillOnlySchedulerOutput,
                                                PrefillOnlyWorkerInput,
                                                TextSchedulableRequest)
from light_vllm_tpu.utils import next_power_of_2


class PrefillOnlyRequestProcessor(RequestProcessor):

    def __init__(self, tokenizer, max_model_len: Optional[int] = None) -> None:
        self.tokenizer = tokenizer
        self.max_model_len = max_model_len

    @classmethod
    def from_engine(cls, engine) -> "PrefillOnlyRequestProcessor":
        return cls(engine.tokenizer,
                   engine.engine_config.model_config.max_model_len)

    def __call__(self, request: TextRequest) -> TextSchedulableRequest:
        inputs = request.inputs
        if not inputs.prompt_token_ids:
            inputs.prompt_token_ids = self.tokenizer.encode(inputs.prompt)
        return TextSchedulableRequest(
            request_id=request.request_id, inputs=inputs,
            params=request.params, arrival_time=request.arrival_time,
            metrics=request.metrics)


class PrefillOnlyModelInputBuilder(ModelInputBuilder):
    """Pads the batch to (B, L) buckets: L to the next power of two (min 16),
    B to the next power of two — so XLA compiles a handful of executables
    instead of one per shape (the TPU answer to the reference's fully
    dynamic batches)."""

    def __init__(self, min_len_bucket: int = 16,
                 max_model_len: int = 512) -> None:
        self.min_len_bucket = min_len_bucket
        self.max_model_len = max_model_len

    @classmethod
    def from_engine(cls, engine) -> "PrefillOnlyModelInputBuilder":
        return cls(max_model_len=engine.engine_config.model_config.max_model_len)

    def __call__(self, output: PrefillOnlySchedulerOutput) -> ExecuteInput:
        requests = output.scheduled_requests
        B = len(requests)
        seq_lens = np.array([r.num_new_tokens() for r in requests],
                            dtype=np.int32)
        max_len = int(seq_lens.max()) if B else 0
        L = min(max(next_power_of_2(max_len), self.min_len_bucket),
                max(self.max_model_len, self.min_len_bucket))
        if max_len > L:
            L = next_power_of_2(max_len)
        Bp = next_power_of_2(B)

        input_ids = np.zeros((Bp, L), dtype=np.int32)
        mask = np.zeros((Bp, L), dtype=np.int32)
        for i, r in enumerate(requests):
            ids = r.inputs.prompt_token_ids
            input_ids[i, :len(ids)] = ids
            mask[i, :len(ids)] = 1
        positions = np.broadcast_to(np.arange(L, dtype=np.int32),
                                    (Bp, L)).copy()
        # seq_lens padded to the B bucket so it can feed the jitted
        # forward (on-device last-token pooling) without adding shapes.
        seq_lens_padded = np.zeros((Bp,), dtype=np.int32)
        seq_lens_padded[:B] = seq_lens
        model_input = ModelInputForEncoder(
            input_ids=input_ids, positions=positions, mask=mask,
            num_real_requests=B, seq_lens=seq_lens_padded)
        return ExecuteInput(worker_input=PrefillOnlyWorkerInput(),
                            model_input=model_input)
