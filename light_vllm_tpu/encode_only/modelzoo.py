"""Encode-only model registry (reference: light_vllm/encode_only/modelzoo/__init__.py:5-10)."""

ENCODE_ONLY_MODELS = {
    # Bare "BertModel" / "XLMRobertaModel" architectures route to the
    # retriever task (that's what real BAAI/bge-m3-style checkpoints
    # declare; reference: light_vllm/retriever/modelzoo/__init__.py:5-11).
    # Raw last-hidden-states from those encoders remain available via the
    # `workflow=` engine-args override pointing at EncodeOnlyWorkflow.
    "BertForMaskedLM": (
        "light_vllm_tpu.models.bert:BertForMaskedLM",
        "light_vllm_tpu.encode_only.workflow:EncodeOnlyWorkflow"),
    "XLMRobertaForMaskedLM": (
        "light_vllm_tpu.models.bert:XLMRobertaForMaskedLM",
        "light_vllm_tpu.encode_only.workflow:EncodeOnlyWorkflow"),
}
