"""Reranker e2e: (query, passage) pair scores vs HF
XLMRobertaForSequenceClassification, including the cross-encoder pair
tokenization path (tokenizer built in-process — no network).
Reference analog: light_vllm/reranker/modelzoo/bge_reranker_v2_m3.py."""

import numpy as np
import pytest

from tests.retriever.test_retriever_e2e import tiny_xlmr_config


def make_pair_tokenizer():
    """A tiny whitespace WordLevel tokenizer with RoBERTa-style pair
    post-processing (<s> A </s></s> B </s>) — enough to drive
    Tokenizer.encode_pair exactly the way an HF checkpoint's would."""
    from tokenizers import Tokenizer as TkTokenizer
    from tokenizers import models, pre_tokenizers
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    words = ["panda", "bear", "china", "paris", "france", "what", "is",
             "capital", "the", "a", "of", "city"]
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for w in words:
        vocab[w] = len(vocab)
    tk = TkTokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    tk.post_processor = TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> </s> $B:1 </s>:1",
        special_tokens=[("<s>", 0), ("</s>", 2)])
    return PreTrainedTokenizerFast(
        tokenizer_object=tk, unk_token="<unk>", pad_token="<pad>",
        cls_token="<s>", sep_token="</s>", bos_token="<s>",
        eos_token="</s>")


@pytest.fixture(scope="module")
def tiny_reranker():
    import torch
    from transformers import (XLMRobertaConfig,
                              XLMRobertaForSequenceClassification)

    cfg = XLMRobertaConfig(num_labels=1, **tiny_xlmr_config())
    torch.manual_seed(1)
    model = XLMRobertaForSequenceClassification(cfg)
    model.eval()
    return cfg, model


def test_pair_scores_match_hf(tiny_reranker):
    import torch

    cfg, hf = tiny_reranker
    tok = make_pair_tokenizer()
    from light_vllm_tpu import LLM

    llm = LLM(hf_config=dict(
                  architectures=["XLMRobertaForSequenceClassification"],
                  num_labels=1, **tiny_xlmr_config()),
              state_dict=hf.state_dict(), dtype="float32",
              max_model_len=64, max_num_requests=4,
              tokenizer_override=tok)
    pairs = [("what is panda", "the panda is a bear of china"),
             ("what is panda", "paris is the capital city of france")]
    outs = llm.reranker(pairs)
    assert len(outs) == 2
    for (q, p), o in zip(pairs, outs):
        enc = tok(q, p)
        ids = torch.tensor([enc["input_ids"]])
        with torch.no_grad():
            ref = float(hf(input_ids=ids,
                           attention_mask=torch.ones_like(ids)
                           ).logits[0, 0])
        assert abs(o.score - ref) < 2e-3, (o.score, ref)
