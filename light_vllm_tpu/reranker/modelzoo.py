"""Reranker model registry (reference: light_vllm/reranker/modelzoo/__init__.py:5-9)."""

RERANKER_MODELS = {
    "BGERerankerV2M3": (
        "light_vllm_tpu.models.bge_reranker:BGERerankerV2M3",
        "light_vllm_tpu.reranker.workflow:RerankerWorkflow"),
    "XLMRobertaForSequenceClassification": (
        "light_vllm_tpu.models.bge_reranker:BGERerankerV2M3",
        "light_vllm_tpu.reranker.workflow:RerankerWorkflow"),
}
