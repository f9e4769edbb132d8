"""Retriever model registry (reference: light_vllm/retriever/modelzoo/__init__.py:1-27)."""

RETRIEVER_MODELS = {
    "BGEM3Model": (
        "light_vllm_tpu.models.bge_m3:BGEM3Model",
        "light_vllm_tpu.retriever.workflow:RetrieverWorkflow"),
    "BertRetriever": (
        "light_vllm_tpu.models.bert:BertModel",
        "light_vllm_tpu.retriever.workflow:RetrieverWorkflow"),
}
