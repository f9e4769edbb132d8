"""Gemma / Gemma2 greedy parity vs HF (models/gemma.py): exercises the
(1+w) RMSNorm, scaled embeddings, GeGLU, and — for Gemma2 — attention +
final logit soft-capping, 4-norm layers, and alternating sliding-window
layers."""

import numpy as np
import pytest
import torch

from light_vllm_tpu import LLM, SamplingParams

BASE = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=96, max_position_embeddings=256,
            head_dim=16, rms_norm_eps=1e-6, rope_theta=10000.0)


def _run_parity(hf_model, hf_cfg_dict, prompts, max_tokens=10):
    ref = []
    for p in prompts:
        with torch.no_grad():
            out = hf_model.generate(torch.tensor([p]), do_sample=False,
                                    max_new_tokens=max_tokens,
                                    pad_token_id=0)
        ref.append(out[0, len(p):].tolist())
    llm = LLM(hf_config=hf_cfg_dict, state_dict=hf_model.state_dict(),
              dtype="float32", max_model_len=128, max_num_seqs=2,
              block_size=16)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        SamplingParams(max_tokens=max_tokens,
                                       temperature=0.0, ignore_eos=True))
    return [list(o.outputs[0].token_ids) for o in outs], ref


def test_gemma_greedy_parity():
    from transformers import GemmaConfig, GemmaForCausalLM
    cfg = dict(BASE, hidden_act="gelu_pytorch_tanh",
               hidden_activation="gelu_pytorch_tanh")
    hf = GemmaForCausalLM(
        GemmaConfig(**cfg, attn_implementation="eager")).eval()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(2, 128, size=n).tolist() for n in (9, 21)]
    got, ref = _run_parity(
        hf, dict(architectures=["GemmaForCausalLM"], **cfg), prompts)
    assert got == ref


def test_gemma2_greedy_parity():
    from transformers import Gemma2Config, Gemma2ForCausalLM
    cfg = dict(BASE, hidden_activation="gelu_pytorch_tanh",
               query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
               final_logit_softcapping=30.0, sliding_window=16)
    hf = Gemma2ForCausalLM(
        Gemma2Config(**cfg, attn_implementation="eager")).eval()
    rng = np.random.default_rng(1)
    # longer than the window so alternating local layers matter
    prompts = [rng.integers(2, 128, size=n).tolist() for n in (40, 12)]
    got, ref = _run_parity(
        hf, dict(architectures=["Gemma2ForCausalLM"], **cfg), prompts)
    assert got == ref
