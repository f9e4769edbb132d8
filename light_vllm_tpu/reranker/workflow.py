"""Reranker workflow (reference: light_vllm/reranker/workflow.py:4-11)."""

from light_vllm_tpu.prefill_only.workflow import PrefillOnlyWorkflow


class RerankerWorkflow(PrefillOnlyWorkflow):
    InputProcessor = ("light_vllm_tpu.reranker.processor:"
                      "RerankerInputProcessor")
    RequestProcessor = ("light_vllm_tpu.reranker.processor:"
                        "RerankerRequestProcessor")
    OutputProcessor = ("light_vllm_tpu.reranker.processor:"
                       "RerankerOutputProcessor")
    attn_type = "ENCODER"
    # Only the model-computed [B] scores leave the device.
    pooling = "score"
