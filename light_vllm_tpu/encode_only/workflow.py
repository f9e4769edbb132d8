"""Encode-only workflow (reference: light_vllm/encode_only/workflow.py:4-10)."""

from light_vllm_tpu.prefill_only.workflow import PrefillOnlyWorkflow


class EncodeOnlyWorkflow(PrefillOnlyWorkflow):
    OutputProcessor = ("light_vllm_tpu.encode_only.output_processor:"
                       "EncodeOnlyOutputProcessor")
    attn_type = "ENCODER"
