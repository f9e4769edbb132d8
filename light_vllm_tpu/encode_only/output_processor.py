"""Encode-only output processing (reference:
light_vllm/encode_only/processor/output_processor.py:12-46): returns raw last
hidden states per request (trimmed to real length). Device→host transfer
happens here, once per batch.
"""

from typing import List

import numpy as np

from light_vllm_tpu.core.processor.output_processor import OutputProcessor
from light_vllm_tpu.core.schema.engine_io import EmbeddingRequestOutput
from light_vllm_tpu.prefill_only.schema import (PrefillOnlyExecuteOutput,
                                                PrefillOnlySchedulerOutput)


class EncodeOnlyOutputProcessor(OutputProcessor):

    def __call__(self, scheduler_output: PrefillOnlySchedulerOutput,
                 execute_output: PrefillOnlyExecuteOutput
                 ) -> List[EmbeddingRequestOutput]:
        outputs = []
        if scheduler_output.scheduled_requests:
            hidden = np.asarray(execute_output.hidden_states)  # [B, L, H]
        for i, r in enumerate(scheduler_output.scheduled_requests):
            n = r.num_new_tokens()
            outputs.append(EmbeddingRequestOutput(
                request_id=r.request_id, finished=True,
                embedding=hidden[i, :n],
                prompt_token_ids=r.inputs.prompt_token_ids))
        for r in scheduler_output.ignored_requests:
            outputs.append(EmbeddingRequestOutput(
                request_id=r.request_id, finished=True, embedding=None))
        return outputs
