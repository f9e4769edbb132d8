"""n>1 sampling: shared-prompt branches diverge and the lead branch stays
greedy-correct."""

import numpy as np
import pytest

from tests.decoding.test_generate_e2e import (hf_greedy, make_llm,
                                              tiny_qwen2_config)


@pytest.fixture(scope="module")
def tiny_qwen2():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(**{k: v for k, v in tiny_qwen2_config().items()
                         if k != "architectures"})
    torch.manual_seed(0)
    return cfg, Qwen2ForCausalLM(cfg).eval()


def test_n_greedy_all_match_hf(tiny_qwen2):
    """Greedy with n=3: all branches should produce the same (correct)
    tokens."""
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model)
    rng = np.random.default_rng(0)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=9).tolist()}
    outs = llm.generate([prompt], SamplingParams(
        n=3, temperature=0.0, max_tokens=8, ignore_eos=True))
    assert len(outs[0].outputs) == 3
    ref = hf_greedy(hf_model, prompt["prompt_token_ids"], 8)
    for comp in outs[0].outputs:
        assert comp.token_ids == ref


def test_n_random_branches_diverge(tiny_qwen2):
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model)
    rng = np.random.default_rng(1)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=7).tolist()}
    outs = llm.generate([prompt], SamplingParams(
        n=4, temperature=1.5, seed=7, max_tokens=10, ignore_eos=True))
    branches = [tuple(c.token_ids) for c in outs[0].outputs]
    assert len(branches) == 4
    assert all(len(b) == 10 for b in branches)
    assert len(set(branches)) >= 2  # hot sampling must diverge

    # seeded: same request again reproduces the same branches
    llm2 = make_llm(hf_model)
    outs2 = llm2.generate([prompt], SamplingParams(
        n=4, temperature=1.5, seed=7, max_tokens=10, ignore_eos=True))
    assert [tuple(c.token_ids) for c in outs2[0].outputs] == branches


def test_n_with_chunked_prefill(tiny_qwen2):
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model, enable_chunked_prefill=True,
                   max_num_batched_tokens=16)
    rng = np.random.default_rng(2)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=40).tolist()}
    outs = llm.generate([prompt], SamplingParams(
        n=2, temperature=0.0, max_tokens=6, ignore_eos=True))
    ref = hf_greedy(hf_model, prompt["prompt_token_ids"], 6)
    for comp in outs[0].outputs:
        assert comp.token_ids == ref
