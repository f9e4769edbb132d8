"""Golden decode e2e: tiny random Qwen2 (HF torch) vs our engine — greedy
token parity, the test the reference lacks (SURVEY.md §4 gap)."""

import numpy as np
import pytest


def tiny_qwen2_config():
    return dict(
        architectures=["Qwen2ForCausalLM"],
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        hidden_act="silu",
        tie_word_embeddings=False,
    )


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


def hf_greedy(hf_model, prompt_ids, n_new):
    import torch

    ids = torch.tensor([prompt_ids])
    with torch.no_grad():
        out = hf_model.generate(ids, max_new_tokens=n_new, do_sample=False,
                                use_cache=True,
                                pad_token_id=0)
    return out[0, len(prompt_ids):].tolist()


def make_llm(hf_model, **kwargs):
    from light_vllm_tpu import LLM

    defaults = dict(
        hf_config=tiny_qwen2_config(),
        state_dict=hf_model.state_dict(),
        dtype="float32",
        max_model_len=128,
        block_size=16,
        num_device_blocks_override=128,
        max_num_seqs=8,
    )
    defaults.update(kwargs)
    return LLM(**defaults)


def test_greedy_matches_hf(tiny_qwen2):
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model)
    rng = np.random.default_rng(0)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=n).tolist()}
               for n in [5, 12, 23]]
    n_new = 16
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=n_new,
                                                ignore_eos=True))
    assert len(outs) == 3
    for out, prompt in zip(outs, prompts):
        ref = hf_greedy(hf_model, prompt["prompt_token_ids"], n_new)
        got = out.outputs[0].token_ids
        assert got == ref, f"greedy mismatch: {got} vs {ref}"


def test_continuous_batching_mixed_lengths(tiny_qwen2):
    """Different max_tokens per request: engine must retire requests at
    different steps while others continue."""
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model)
    rng = np.random.default_rng(1)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=6).tolist()}
               for _ in range(4)]
    params = [SamplingParams(temperature=0.0, max_tokens=m, ignore_eos=True)
              for m in [3, 17, 8, 1]]
    outs = llm.generate(prompts, params)
    for out, p, prompt in zip(outs, params, prompts):
        assert len(out.outputs[0].token_ids) == p.max_tokens
        ref = hf_greedy(hf_model, prompt["prompt_token_ids"], p.max_tokens)
        assert out.outputs[0].token_ids == ref


def test_chunked_prefill_matches(tiny_qwen2):
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model, enable_chunked_prefill=True,
                   max_num_batched_tokens=16)
    rng = np.random.default_rng(2)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=40).tolist()}
    outs = llm.generate([prompt], SamplingParams(temperature=0.0,
                                                 max_tokens=8,
                                                 ignore_eos=True))
    ref = hf_greedy(hf_model, prompt["prompt_token_ids"], 8)
    assert outs[0].outputs[0].token_ids == ref


def test_stop_token(tiny_qwen2):
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model)
    rng = np.random.default_rng(3)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=8).tolist()}
    ref = hf_greedy(hf_model, prompt["prompt_token_ids"], 16)
    stop_tok = ref[4]
    outs = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=16, ignore_eos=True,
        stop_token_ids=[stop_tok]))
    got = outs[0].outputs[0].token_ids
    assert got == ref[:5]
    assert outs[0].outputs[0].finish_reason == "stop"
