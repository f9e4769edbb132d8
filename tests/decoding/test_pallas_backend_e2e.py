"""Pallas attention backend driven through the FULL engine in CI
(interpret mode on CPU) — token parity vs the jnp reference backend
(VERDICT r4 #6: the r4 NaN-scratch bug class lived in compiled-kernel
state the kernel-level tests never reached through the engine; the
suite-wide conftest forces LVT_ATTENTION_BACKEND=reference, so this test
opts back in explicitly)."""

import pytest

from tests.decoding.test_generate_e2e import make_llm, tiny_qwen2_config  # noqa: F401


@pytest.fixture(scope="module")
def tiny_qwen2():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg_d = tiny_qwen2_config()
    cfg = Qwen2Config(**{k: v for k, v in cfg_d.items()
                         if k != "architectures"})
    torch.manual_seed(0)
    return cfg_d, Qwen2ForCausalLM(cfg).eval()


def test_pallas_engine_generate_token_parity(tiny_qwen2, monkeypatch):
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    # Mixed prefill lengths + enough decode steps to cross a page
    # boundary and a multi-page contiguous-fetch chunk.
    prompts = [{"prompt_token_ids": list(range(3, 3 + n))}
               for n in (5, 17, 33, 60)]
    params = SamplingParams(temperature=0.0, max_tokens=12,
                            ignore_eos=True)

    monkeypatch.setenv("LVT_ATTENTION_BACKEND", "reference")
    llm_ref = make_llm(hf_model)
    ref = [o.outputs[0].token_ids for o in llm_ref.generate(prompts,
                                                            params)]
    llm_ref.shutdown()

    monkeypatch.setenv("LVT_ATTENTION_BACKEND", "pallas")
    llm_pl = make_llm(hf_model)
    from light_vllm_tpu.decoding.attention import PallasPagedAttnBackend
    assert isinstance(llm_pl.llm_engine.attn_backend,
                      PallasPagedAttnBackend)
    got = [o.outputs[0].token_ids for o in llm_pl.generate(prompts,
                                                           params)]
    llm_pl.shutdown()

    assert got == ref
