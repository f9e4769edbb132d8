"""BGE-reranker-v2-m3: XLM-RoBERTa cross-encoder + classification head
(reference: light_vllm/reranker/modelzoo/bge_reranker_v2_m3.py:10).

HF XLMRobertaForSequenceClassification head: dense(H→H) on CLS → tanh →
out_proj(H→1); the scalar is the relevance score.
"""

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from light_vllm_tpu.layers.base import Layer, tree_specs
from light_vllm_tpu.layers.linear import ReplicatedLinear
from light_vllm_tpu.models.bert import XLMRobertaModel


class BGERerankerV2M3(XLMRobertaModel):

    def __init__(self, model_config, attn_backend=None):
        super().__init__(model_config, attn_backend)
        cfg = model_config.hf_config
        H = cfg.hidden_size
        num_labels = getattr(cfg, "num_labels", 1) or 1
        self.cls_dense = ReplicatedLinear(H, H, bias=True, dtype=self.dtype)
        self.cls_out = ReplicatedLinear(H, num_labels, bias=True,
                                        dtype=self.dtype)

    def layer_tree(self):
        tree = super().layer_tree()
        tree["cls_dense"] = self.cls_dense
        tree["cls_out"] = self.cls_out
        return tree

    def __call__(self, params, input_ids, positions, mask,
                 token_type_ids=None):
        out = super().__call__(params, input_ids, positions, mask,
                               token_type_ids)
        cls = out["hidden_states"][:, 0]
        h = jnp.tanh(self.cls_dense(params["cls_dense"], cls))
        scores = self.cls_out(params["cls_out"], h)  # [B, num_labels]
        out["pooled_output"] = scores[:, 0].astype(jnp.float32)
        return out

    def load_weights(self, weights: Iterator[Tuple[str, np.ndarray]]):
        cached = list(weights)
        params = super().load_weights(iter(cached))
        raw = {}
        for name, arr in cached:
            if name.startswith("classifier."):
                raw[name] = np.asarray(arr)
        params["cls_dense"] = {
            "kernel": raw["classifier.dense.weight"].T,
            "bias": raw["classifier.dense.bias"]}
        params["cls_out"] = {
            "kernel": raw["classifier.out_proj.weight"].T,
            "bias": raw["classifier.out_proj.bias"]}
        return params
