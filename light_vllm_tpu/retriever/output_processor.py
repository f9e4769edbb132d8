"""Retriever output processing: CLS-pooled, L2-normalized dense vectors
(reference: light_vllm/retriever/modelzoo/bge_m3.py:41-60 +
light_vllm/retriever/processor/output_processor.py)."""

from typing import List

import numpy as np

from light_vllm_tpu.core.processor.output_processor import OutputProcessor
from light_vllm_tpu.core.schema.engine_io import EmbeddingRequestOutput
from light_vllm_tpu.prefill_only.schema import (PrefillOnlyExecuteOutput,
                                                PrefillOnlySchedulerOutput)


class RetrieverOutputProcessor(OutputProcessor):

    def __call__(self, scheduler_output: PrefillOnlySchedulerOutput,
                 execute_output: PrefillOnlyExecuteOutput
                 ) -> List[EmbeddingRequestOutput]:
        outputs = []
        if scheduler_output.scheduled_requests:
            if execute_output.dense_vecs is not None:
                # Pooled + normalized on device (workflow pooling=
                # "cls_norm"): [B, H] float32, ~500x less d2h traffic
                # than the hidden-states fallback below.
                dense = np.asarray(execute_output.dense_vecs)
            else:
                hidden = np.asarray(execute_output.hidden_states)
                cls_vecs = hidden[:, 0].astype(np.float32)
                norms = np.linalg.norm(cls_vecs, axis=-1, keepdims=True)
                dense = cls_vecs / np.maximum(norms, 1e-12)
        for i, r in enumerate(scheduler_output.scheduled_requests):
            outputs.append(EmbeddingRequestOutput(
                request_id=r.request_id, finished=True, embedding=dense[i],
                prompt_token_ids=r.inputs.prompt_token_ids))
        for r in scheduler_output.ignored_requests:
            outputs.append(EmbeddingRequestOutput(
                request_id=r.request_id, finished=True, embedding=None))
        return outputs
