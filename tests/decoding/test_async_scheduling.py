"""Async scheduling: in-flight window + busy flags produce the same tokens
as sync (the reference's headline feature, reference:
light_vllm/core/llm_engine.py:132-176)."""

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
    model = Qwen2ForCausalLM(cfg)
    model.eval()
    return cfg, model


@pytest.mark.parametrize("scheduling",
                         ["simple_async", "async", "double_buffer"])
def test_async_matches_sync_greedy(tiny_qwen2, scheduling):
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model, scheduling=scheduling)
    rng = np.random.default_rng(5)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=n).tolist()}
               for n in [5, 9, 14, 7]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=12,
                                                ignore_eos=True))
    assert len(outs) == 4
    for out, prompt in zip(outs, prompts):
        ref = hf_greedy(hf_model, prompt["prompt_token_ids"], 12)
        assert out.outputs[0].token_ids == ref
    llm.llm_engine.shutdown()
