"""Reranker processors: (query, passage) cross-encoder tokenization + scalar
score extraction (reference: light_vllm/reranker/processor/input_processor.py:15-58,
light_vllm/reranker/processor/output_processor.py:10-32)."""

from typing import List, Optional, Tuple, Union

import numpy as np

from light_vllm_tpu.core.processor.input_processor import InputProcessor
from light_vllm_tpu.core.processor.output_processor import OutputProcessor
from light_vllm_tpu.core.processor.input_processor import RequestProcessor
from light_vllm_tpu.core.schema.engine_io import (Params,
                                                  RerankerRequestOutput,
                                                  Request, TextOnlyInputs,
                                                  ValidationError)
from light_vllm_tpu.prefill_only.schema import (PrefillOnlyExecuteOutput,
                                                PrefillOnlySchedulerOutput,
                                                TextSchedulableRequest)
from dataclasses import dataclass, field

from light_vllm_tpu.reranker.schema import Pairs


@dataclass
class RerankerRequest(Request):
    pairs: Optional[Pairs] = None
    params: Optional[Params] = None


class RerankerInputProcessor(InputProcessor):

    def __call__(self, request_id: str, prompt, params, arrival_time
                 ) -> RerankerRequest:
        if isinstance(prompt, Pairs):
            pairs = prompt
        elif isinstance(prompt, (tuple, list)) and len(prompt) == 2:
            pairs = Pairs(query=prompt[0], passage=prompt[1])
        elif isinstance(prompt, dict) and "query" in prompt:
            pairs = Pairs(query=prompt["query"], passage=prompt["passage"])
        else:
            raise ValidationError(
                "reranker expects (query, passage) pairs, got "
                f"{type(prompt)!r}")
        return RerankerRequest(request_id=str(request_id), pairs=pairs,
                               params=params, arrival_time=arrival_time)


class RerankerRequestProcessor(RequestProcessor):

    def __init__(self, tokenizer, max_model_len: int) -> None:
        self.tokenizer = tokenizer
        self.max_model_len = max_model_len

    @classmethod
    def from_engine(cls, engine) -> "RerankerRequestProcessor":
        return cls(engine.tokenizer,
                   engine.engine_config.model_config.max_model_len)

    def __call__(self, request: RerankerRequest) -> TextSchedulableRequest:
        ids = self.tokenizer.encode_pair(request.pairs.query,
                                         request.pairs.passage,
                                         max_length=self.max_model_len)
        return TextSchedulableRequest(
            request_id=request.request_id,
            inputs=TextOnlyInputs(prompt_token_ids=ids),
            params=request.params, arrival_time=request.arrival_time,
            metrics=request.metrics)


class RerankerOutputProcessor(OutputProcessor):

    def __call__(self, scheduler_output: PrefillOnlySchedulerOutput,
                 execute_output: PrefillOnlyExecuteOutput
                 ) -> List[RerankerRequestOutput]:
        outputs = []
        if scheduler_output.scheduled_requests:
            scores = np.asarray(execute_output.pooled_output,
                                dtype=np.float32)  # [B]
        for i, r in enumerate(scheduler_output.scheduled_requests):
            outputs.append(RerankerRequestOutput(
                request_id=r.request_id, finished=True,
                score=float(scores[i])))
        for r in scheduler_output.ignored_requests:
            outputs.append(RerankerRequestOutput(
                request_id=r.request_id, finished=True, score=float("nan")))
        return outputs
