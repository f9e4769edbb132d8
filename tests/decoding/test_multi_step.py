"""Multi-step decode (K chained iterations per dispatch) greedy parity."""

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


@pytest.mark.parametrize("K", [4, 8])
def test_multi_step_greedy_matches_hf(tiny_qwen2, K):
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model, num_scheduler_steps=K)
    rng = np.random.default_rng(0)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=n).tolist()}
               for n in [5, 11, 17]]
    n_new = 13  # not a multiple of K: exercises mid-ring finish
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=n_new,
                                                ignore_eos=True))
    for out, prompt in zip(outs, prompts):
        ref = hf_greedy(hf_model, prompt["prompt_token_ids"], n_new)
        assert out.outputs[0].token_ids == ref


def test_multi_step_eos_mid_ring(tiny_qwen2):
    """A stop token hit inside the ring must truncate cleanly."""
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model, num_scheduler_steps=8)
    rng = np.random.default_rng(3)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=8).tolist()}
    ref = hf_greedy(hf_model, prompt["prompt_token_ids"], 16)
    stop_tok = ref[5]
    outs = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=16, ignore_eos=True,
        stop_token_ids=[stop_tok]))
    assert outs[0].outputs[0].token_ids == ref[:6]
    assert outs[0].outputs[0].finish_reason == "stop"


def test_multi_step_crosses_page_boundary(tiny_qwen2):
    """Ring crossing a 16-token page boundary: lookahead pages must exist
    and tokens stay correct."""
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model, num_scheduler_steps=8)
    prompt = {"prompt_token_ids": list(range(3, 17))}  # len 14, page 16
    outs = llm.generate([prompt], SamplingParams(temperature=0.0,
                                                 max_tokens=24,
                                                 ignore_eos=True))
    ref = hf_greedy(hf_model, prompt["prompt_token_ids"], 24)
    assert outs[0].outputs[0].token_ids == ref
