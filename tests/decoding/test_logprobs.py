"""Logprobs output plumbing + parity with HF log-softmax."""

import numpy as np
import pytest

from tests.decoding.test_generate_e2e import make_llm, tiny_qwen2_config


@pytest.fixture(scope="module")
def tiny_qwen2():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(**{k: v for k, v in tiny_qwen2_config().items()
                         if k != "architectures"})
    torch.manual_seed(0)
    return cfg, Qwen2ForCausalLM(cfg).eval()


def test_logprobs_returned_and_match_hf(tiny_qwen2):
    import torch

    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model)
    ids = [5, 17, 33, 47]
    outs = llm.generate([{"prompt_token_ids": ids}],
                        SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True, logprobs=5))
    comp = outs[0].outputs[0]
    assert comp.logprobs is not None and len(comp.logprobs) == 4
    first = comp.logprobs[0]
    assert len(first) >= 5
    assert comp.token_ids[0] in first

    # HF check of the first step's distribution
    with torch.no_grad():
        logits = hf_model(torch.tensor([ids])).logits[0, -1]
    ref_lp = torch.log_softmax(logits.float(), dim=-1)
    for tok, lp in first.items():
        assert abs(ref_lp[tok].item() - lp) < 2e-2

    # cumulative_logprob = sum of chosen logprobs
    assert comp.cumulative_logprob == pytest.approx(
        sum(comp.logprobs[i][comp.token_ids[i]] for i in range(4)), rel=1e-3)
