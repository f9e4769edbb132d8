"""Engine shutdown must free device memory and leave the process able to
serve a second engine (bench legs, notebook reloads). Reference has no
analog (one engine per process, CUDA frees at exit); on TPU a leaked
buffer from engine N OOMs engine N+1 — r03's 8B bench leg died that way.
"""

import jax
import pytest

from light_vllm_tpu import LLM
from light_vllm_tpu.decoding.sampling_params import SamplingParams


def tiny_qwen2():
    return dict(
        architectures=["Qwen2ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=512, max_position_embeddings=512,
        rms_norm_eps=1e-6, rope_theta=10000.0, hidden_act="silu",
        tie_word_embeddings=False)


def _gen(llm):
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                        detokenize=False)
    return list(llm.generate([{"prompt_token_ids": [1, 2, 3, 4]}],
                             sp)[0].outputs[0].token_ids)


@pytest.mark.parametrize("scheduling", ["sync", "async"])
def test_shutdown_frees_arrays_and_next_engine_matches(scheduling):
    llm = LLM(hf_config=tiny_qwen2(), load_format="dummy",
              max_model_len=128, max_num_seqs=8, block_size=16,
              scheduling=scheduling)
    toks1 = _gen(llm)
    n_before = len(jax.live_arrays())
    llm.shutdown()
    n_after = len(jax.live_arrays())
    # params (dozens of leaves) + KV must be gone; a handful of
    # module-level constants may stay.
    assert n_after < n_before, (n_before, n_after)

    # engine is reusable-from-scratch: same seed -> same greedy tokens
    llm2 = LLM(hf_config=tiny_qwen2(), load_format="dummy",
               max_model_len=128, max_num_seqs=8, block_size=16,
               scheduling=scheduling)
    toks2 = _gen(llm2)
    llm2.shutdown()
    assert toks1 == toks2


def test_shutdown_idempotent_and_waits_precompile():
    llm = LLM(hf_config=tiny_qwen2(), load_format="dummy",
              max_model_len=128, max_num_seqs=8, block_size=16)
    assert llm.llm_engine.wait_for_precompile() >= 0
    llm.shutdown()
    llm.shutdown()  # second call must be a no-op, not a crash
