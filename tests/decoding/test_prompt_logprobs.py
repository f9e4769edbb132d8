"""prompt_logprobs end-to-end vs HF torch log-softmax (VERDICT r1 #5b;
reference: backends/sampler.py get_logprobs prompt path +
processor/utils/single_step.py process_prompt_logprob)."""

import numpy as np
import pytest

from tests.decoding.test_generate_e2e import (make_llm,  # noqa: F401
                                              tiny_qwen2)


def hf_prompt_logprobs(hf_model, prompt_ids):
    """[None] + logprob dict of each prompt token given its prefix."""
    import torch

    ids = torch.tensor([prompt_ids])
    with torch.no_grad():
        logits = hf_model(ids).logits[0]  # [L, V]
    logz = torch.log_softmax(logits.float(), dim=-1)
    out = [None]
    for pos in range(1, len(prompt_ids)):
        out.append(float(logz[pos - 1, prompt_ids[pos]]))
    return out


@pytest.mark.parametrize("chunked", [False, True])
def test_prompt_logprobs_match_hf(tiny_qwen2, chunked):  # noqa: F811
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    kwargs = dict(enable_chunked_prefill=True,
                  max_num_batched_tokens=16) if chunked else {}
    llm = make_llm(hf_model, **kwargs)
    rng = np.random.default_rng(1)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=n).tolist()}
               for n in [6, 21]]
    sp = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                        prompt_logprobs=3)
    outs = llm.generate(prompts, sp)
    for out, prompt in zip(outs, prompts):
        ids = prompt["prompt_token_ids"]
        got = out.prompt_logprobs
        ref = hf_prompt_logprobs(hf_model, ids)
        assert got is not None and len(got) == len(ids) == len(ref)
        assert got[0] is None
        for pos in range(1, len(ids)):
            d = got[pos]
            # the actual prompt token's logprob is always present
            assert ids[pos] in d
            assert abs(d[ids[pos]] - ref[pos]) < 2e-2, (pos, d, ref[pos])
            # top-k entries present (k=3, plus the target if outside)
            assert len(d) >= 3


def test_no_prompt_logprobs_by_default(tiny_qwen2):  # noqa: F811
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model)
    outs = llm.generate([{"prompt_token_ids": [5, 6, 7, 8]}],
                        SamplingParams(temperature=0.0, max_tokens=2,
                                       ignore_eos=True))
    assert outs[0].prompt_logprobs is None
