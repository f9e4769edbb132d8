"""Encode-only model registry (reference: light_vllm/encode_only/modelzoo/__init__.py:5-10)."""

ENCODE_ONLY_MODELS = {
    "BertModel": (
        "light_vllm_tpu.models.bert:BertModel",
        "light_vllm_tpu.encode_only.workflow:EncodeOnlyWorkflow"),
    "BertForMaskedLM": (
        "light_vllm_tpu.models.bert:BertForMaskedLM",
        "light_vllm_tpu.encode_only.workflow:EncodeOnlyWorkflow"),
    "XLMRobertaModel": (
        "light_vllm_tpu.models.bert:XLMRobertaModel",
        "light_vllm_tpu.encode_only.workflow:EncodeOnlyWorkflow"),
    "XLMRobertaForMaskedLM": (
        "light_vllm_tpu.models.bert:XLMRobertaForMaskedLM",
        "light_vllm_tpu.encode_only.workflow:EncodeOnlyWorkflow"),
}
