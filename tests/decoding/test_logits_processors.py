"""Per-request logits_processors via the documented host-side resample
path (VERDICT r1 #5c; reference: backends/sampling_params.py:39 +
backends/sampler.py _apply_logits_processors)."""

import numpy as np

from tests.decoding.test_generate_e2e import (make_llm,  # noqa: F401
                                              tiny_qwen2)


def test_logits_processor_forces_token(tiny_qwen2):  # noqa: F811
    """A processor that pins all mass on one token must fully control the
    output, proving the host path overrides the device sample."""
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model)
    forced = 42

    def force(output_ids, logits):
        out = np.full_like(logits, -1e9)
        out[forced + len(output_ids) % 3] = 0.0  # varies with history
        return out

    outs = llm.generate(
        [{"prompt_token_ids": [5, 6, 7, 8, 9]}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                       logits_processors=[force]))
    got = outs[0].outputs[0].token_ids
    assert got == [42, 43, 44, 42, 43, 44], got


def test_logits_processor_mixed_batch(tiny_qwen2):  # noqa: F811
    """A processor request must not perturb greedy requests in the same
    batch (device rows stay authoritative for non-processor rows)."""
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model)
    rng = np.random.default_rng(3)
    plain_prompt = {"prompt_token_ids": rng.integers(3, 250,
                                                     size=9).tolist()}
    base = llm.generate([plain_prompt],
                        SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True))
    got_base = base[0].outputs[0].token_ids

    def ban_best(output_ids, logits):
        out = logits.copy()
        out[int(np.argmax(out))] = -1e9
        return out

    llm2 = make_llm(hf_model)
    outs = llm2.generate(
        [plain_prompt, {"prompt_token_ids": [5, 6, 7, 8, 9]}],
        [SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
         SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        logits_processors=[ban_best])])
    assert outs[0].outputs[0].token_ids == got_base
    # the banned-argmax stream must differ from plain greedy on its prompt
    plain2 = llm2.generate(
        [{"prompt_token_ids": [5, 6, 7, 8, 9]}],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert outs[1].outputs[0].token_ids != plain2[0].outputs[0].token_ids
