"""Mixtral MoE greedy parity vs HF torch."""

import numpy as np
import pytest


def tiny_mixtral_config():
    return dict(
        architectures=["MixtralForCausalLM"],
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        hidden_act="silu",
        tie_word_embeddings=False,
    )


@pytest.fixture(scope="module")
def tiny_mixtral():
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(**{k: v for k, v in tiny_mixtral_config().items()
                           if k != "architectures"})
    torch.manual_seed(0)
    return cfg, MixtralForCausalLM(cfg).eval()


def test_mixtral_greedy_matches_hf(tiny_mixtral):
    import torch

    from light_vllm_tpu import LLM, SamplingParams

    cfg, hf_model = tiny_mixtral
    llm = LLM(hf_config=tiny_mixtral_config(),
              state_dict=hf_model.state_dict(), dtype="float32",
              max_model_len=128, block_size=16,
              num_device_blocks_override=64, max_num_seqs=4)
    rng = np.random.default_rng(0)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=11).tolist()}
    outs = llm.generate([prompt], SamplingParams(temperature=0.0,
                                                 max_tokens=8,
                                                 ignore_eos=True))
    ids = torch.tensor([prompt["prompt_token_ids"]])
    with torch.no_grad():
        ref = hf_model.generate(ids, max_new_tokens=8, do_sample=False,
                                pad_token_id=0)[0, 11:].tolist()
    assert outs[0].outputs[0].token_ids == ref
