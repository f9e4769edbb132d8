"""Retriever (embedding) workflow (reference: light_vllm/retriever/workflow.py:5-13)."""

from light_vllm_tpu.encode_only.workflow import EncodeOnlyWorkflow


class RetrieverWorkflow(EncodeOnlyWorkflow):
    OutputProcessor = ("light_vllm_tpu.retriever.output_processor:"
                       "RetrieverOutputProcessor")
    # CLS-pool + L2-normalize inside the jitted forward; only [B, H]
    # float32 vectors cross the device link (not [B, L, H] hidden states).
    pooling = "cls_norm"


class RetrieverDecodeOnlyWorkflow(EncodeOnlyWorkflow):
    """Decoder-as-embedder: runs on the prefill-only stack with last-token
    pooling (reference: light_vllm/retriever/modelzoo/gte_qwen/workflow.py)."""

    OutputProcessor = ("light_vllm_tpu.decode_only.output_processor:"
                       "LastHiddenStatesOutputProcessor")
    attn_type = "DECODER"
    pooling = "last_norm"
