"""Sliding-window attention e2e: greedy parity vs HF Mistral with a window
small enough that it changes the logits (reference: sliding-window support,
light_vllm/decoding/core/block_manager_v1.py:441-445 block rotation +
model_input_builder.py:281-309 trimming)."""

import numpy as np
import torch
from transformers import MistralConfig, MistralForCausalLM

from light_vllm_tpu import LLM, SamplingParams

CFG = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
           num_attention_heads=4, num_key_value_heads=2,
           intermediate_size=96, max_position_embeddings=256,
           rope_theta=10000.0, rms_norm_eps=1e-6, hidden_act="silu",
           sliding_window=16, tie_word_embeddings=False)


def test_sliding_window_greedy_parity():
    hf = MistralForCausalLM(
        MistralConfig(**CFG, attn_implementation="eager")).eval()
    rng = np.random.default_rng(0)
    # prompts longer than the window so the window actually matters
    prompts = [rng.integers(2, 128, size=n).tolist() for n in (40, 25)]
    ref = []
    for p in prompts:
        with torch.no_grad():
            out = hf.generate(torch.tensor([p]), do_sample=False,
                              max_new_tokens=10, pad_token_id=0)
        ref.append(out[0, len(p):].tolist())

    llm = LLM(hf_config=dict(architectures=["MistralForCausalLM"], **CFG),
              state_dict=hf.state_dict(), dtype="float32",
              max_model_len=128, max_num_seqs=2, block_size=16)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        SamplingParams(max_tokens=10, temperature=0.0,
                                       ignore_eos=True))
    got = [list(o.outputs[0].token_ids) for o in outs]
    assert got == ref
