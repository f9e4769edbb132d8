"""Decoder-as-embedder output processing: last-token pooling (+optional
normalize) (reference:
light_vllm/decode_only/output_last_hidden_states/processor/output_processor.py:11-37).
"""

from typing import List

import numpy as np

from light_vllm_tpu.core.processor.output_processor import OutputProcessor
from light_vllm_tpu.core.schema.engine_io import EmbeddingRequestOutput
from light_vllm_tpu.prefill_only.schema import (PrefillOnlyExecuteOutput,
                                                PrefillOnlySchedulerOutput)


class LastHiddenStatesOutputProcessor(OutputProcessor):

    def __init__(self, normalize: bool = True) -> None:
        self.normalize = normalize

    @classmethod
    def from_engine(cls, engine):
        return cls()

    def __call__(self, scheduler_output: PrefillOnlySchedulerOutput,
                 execute_output: PrefillOnlyExecuteOutput
                 ) -> List[EmbeddingRequestOutput]:
        outputs = []
        if scheduler_output.scheduled_requests:
            dense = None
            if execute_output.dense_vecs is not None:
                # Last-token pooled + normalized on device (workflow
                # pooling="last_norm"): [B, H] float32 only.
                dense = np.asarray(execute_output.dense_vecs)
            else:
                hidden = np.asarray(execute_output.hidden_states)
        for i, r in enumerate(scheduler_output.scheduled_requests):
            if dense is not None:
                vec = dense[i]
            else:
                n = r.num_new_tokens()
                vec = hidden[i, n - 1].astype(np.float32)
                if self.normalize:
                    vec = vec / max(float(np.linalg.norm(vec)), 1e-12)
            outputs.append(EmbeddingRequestOutput(
                request_id=r.request_id, finished=True, embedding=vec,
                prompt_token_ids=r.inputs.prompt_token_ids))
        for r in scheduler_output.ignored_requests:
            outputs.append(EmbeddingRequestOutput(
                request_id=r.request_id, finished=True, embedding=None))
        return outputs
