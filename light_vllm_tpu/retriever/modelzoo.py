"""Retriever model registry (reference: light_vllm/retriever/modelzoo/__init__.py:1-27)."""

RETRIEVER_MODELS = {
    # Real checkpoints publish the *encoder* architecture name: BAAI/bge-m3's
    # config.json declares "XLMRobertaModel", bge-small style retrievers
    # declare "BertModel" — the retriever task claims those, matching
    # reference: light_vllm/retriever/modelzoo/__init__.py:5-11. Raw hidden
    # states from the same encoders are still reachable via the
    # `workflow=` engine-args override.
    "XLMRobertaModel": (
        "light_vllm_tpu.models.bge_m3:BGEM3Model",
        "light_vllm_tpu.retriever.workflow:RetrieverWorkflow"),
    "BertModel": (
        "light_vllm_tpu.models.bert:BertModel",
        "light_vllm_tpu.retriever.workflow:RetrieverWorkflow"),
    "BGEM3Model": (
        "light_vllm_tpu.models.bge_m3:BGEM3Model",
        "light_vllm_tpu.retriever.workflow:RetrieverWorkflow"),
    "BertRetriever": (
        "light_vllm_tpu.models.bert:BertModel",
        "light_vllm_tpu.retriever.workflow:RetrieverWorkflow"),
}
