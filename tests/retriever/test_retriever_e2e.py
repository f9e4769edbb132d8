"""Retriever (BGE-M3-class) e2e: dense vectors vs HF XLM-RoBERTa — the
XLM-R variant (position offset by padding_idx) had no direct coverage.
Reference analog: light_vllm/retriever/modelzoo/bge_m3.py:18-60."""

import numpy as np
import pytest


def tiny_xlmr_config():
    return dict(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=128,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        hidden_act="gelu",
        pad_token_id=1,
    )


@pytest.fixture(scope="module")
def tiny_xlmr():
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = XLMRobertaConfig(**tiny_xlmr_config())
    torch.manual_seed(0)
    model = XLMRobertaModel(cfg, add_pooling_layer=False)
    model.eval()
    return cfg, model


def test_dense_vecs_match_hf(tiny_xlmr):
    import torch

    cfg, hf = tiny_xlmr
    from light_vllm_tpu import LLM

    # "XLMRobertaModel" is what the real BAAI/bge-m3 config.json declares;
    # the registry must route it to the retriever workflow (VERDICT r2 #3).
    llm = LLM(hf_config=dict(architectures=["XLMRobertaModel"],
                             **tiny_xlmr_config()),
              state_dict=hf.state_dict(), dtype="float32",
              max_model_len=64, max_num_requests=4)
    prompts = [[0, 55, 66, 77, 2], [0, 30, 31, 32, 33, 34, 2]]
    outs = llm.encode([{"prompt_token_ids": p} for p in prompts])
    assert len(outs) == 2
    for p, o in zip(prompts, outs):
        ids = torch.tensor([p])
        with torch.no_grad():
            ref = hf(input_ids=ids,
                     attention_mask=torch.ones_like(ids)
                     ).last_hidden_state[0, 0].numpy()
        ref = ref / np.linalg.norm(ref)
        got = np.asarray(o.embedding, dtype=np.float32)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        # normalized
        assert abs(np.linalg.norm(got) - 1.0) < 1e-5


def test_bert_retriever_real_arch_routing():
    """A bare "BertModel" architecture (what bge-small-en-style retriever
    checkpoints declare) routes to the retriever workflow and returns
    normalized dense vectors (reference:
    light_vllm/retriever/modelzoo/__init__.py:5-11 BertModel->BertRetriever)."""
    import torch
    from transformers import BertConfig, BertModel

    from light_vllm_tpu import LLM
    from tests.conftest import make_tiny_bert_config

    cfg_d = make_tiny_bert_config()
    cfg = BertConfig(**{k: v for k, v in cfg_d.items()
                        if k != "architectures"})
    torch.manual_seed(0)
    hf = BertModel(cfg).eval()
    llm = LLM(hf_config=cfg_d, state_dict=hf.state_dict(),
              dtype="float32", max_model_len=64, max_num_requests=4)
    from light_vllm_tpu.retriever.output_processor import \
        RetrieverOutputProcessor
    assert isinstance(llm.llm_engine.output_processor,
                      RetrieverOutputProcessor)
    prompt = [5, 6, 7, 8, 9]
    out = llm.encode([{"prompt_token_ids": prompt}])[0]
    import numpy as np
    got = np.asarray(out.embedding, np.float32)
    with torch.no_grad():
        ids = torch.tensor([prompt])
        ref = hf(input_ids=ids,
                 attention_mask=torch.ones_like(ids)
                 ).last_hidden_state[0, 0].numpy()
    ref = ref / np.linalg.norm(ref)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-5
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
