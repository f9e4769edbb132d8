"""FP8 KV cache: loose greedy parity vs bf16 cache (reference:
Fp8KVCacheMethod, light_vllm/backends/quantization/kv_cache.py)."""

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


def test_fp8_kv_generates_and_mostly_matches(tiny_qwen2):
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model, kv_cache_dtype="fp8")
    rng = np.random.default_rng(0)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=9).tolist()}
    outs = llm.generate([prompt], SamplingParams(temperature=0.0,
                                                 max_tokens=8,
                                                 ignore_eos=True))
    got = outs[0].outputs[0].token_ids
    assert len(got) == 8
    ref = hf_greedy(hf_model, prompt["prompt_token_ids"], 8)
    # fp8 KV quantization noise: require the first tokens to agree
    assert got[:2] == ref[:2]
