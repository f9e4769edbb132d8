"""logit_bias / allowed_token_ids / truncate_prompt_tokens — implemented on
the per-request logits-processor host path (the reference declares these
fields, backends/sampling_params.py:201-212, but never consumes them)."""

import numpy as np

from tests.decoding.test_generate_e2e import (make_llm,
                                              tiny_qwen2)  # noqa: F401


def test_logit_bias_forces_token(tiny_qwen2):  # noqa: F811
    _, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                        logit_bias={42: 1000.0})
    outs = llm.generate([{"prompt_token_ids": [5, 6, 7]}], sp)
    assert list(outs[0].outputs[0].token_ids) == [42, 42, 42, 42]


def test_allowed_token_ids_restricts_vocab(tiny_qwen2):  # noqa: F811
    _, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model)
    allowed = [11, 12, 13]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        allowed_token_ids=allowed)
    outs = llm.generate([{"prompt_token_ids": [5, 6, 7]}], sp)
    got = list(outs[0].outputs[0].token_ids)
    assert len(got) == 6 and all(t in allowed for t in got)


def test_truncate_prompt_tokens(tiny_qwen2):  # noqa: F811
    _, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model)
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 250, size=30).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        truncate_prompt_tokens=9)
    full = llm.generate([{"prompt_token_ids": prompt}], sp)
    ref = llm.generate([{"prompt_token_ids": prompt[-9:]}],
                       SamplingParams(temperature=0.0, max_tokens=6,
                                      ignore_eos=True))
    assert list(full[0].outputs[0].token_ids) == \
        list(ref[0].outputs[0].token_ids)
    assert len(full[0].prompt_token_ids) == 9
