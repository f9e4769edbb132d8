"""BGE-M3 dense retriever = XLM-RoBERTa encoder; dense vectors are the
normalized CLS hidden state, computed in the retriever output processor
(reference: light_vllm/retriever/modelzoo/bge_m3.py:18-60)."""

from light_vllm_tpu.models.bert import XLMRobertaModel


class BGEM3Model(XLMRobertaModel):
    pass
