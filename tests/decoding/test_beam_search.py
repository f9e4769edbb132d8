"""Beam search + best_of>n (VERDICT r2 missing #1).

Parity target: HF transformers `generate(num_beams=W)` — the semantics the
reference carries vestigially (decoding/schema/sequence.py:350
get_beam_search_score cites the same HF scorer).
"""

import numpy as np
import pytest

from tests.decoding.test_generate_e2e import (hf_greedy, make_llm,
                                              tiny_qwen2_config)


@pytest.fixture(scope="module")
def tiny_qwen2():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(**{k: v for k, v in tiny_qwen2_config().items()
                         if k != "architectures"})
    torch.manual_seed(0)
    return cfg, Qwen2ForCausalLM(cfg).eval()


def hf_beam(hf_model, prompt_ids, n_new, width, n_ret=None,
            length_penalty=1.0, early_stopping=False, ignore_eos=True):
    import torch

    ids = torch.tensor([prompt_ids])
    kwargs = {}
    if ignore_eos:
        # a token id the tiny model can't produce, to disable EOS
        kwargs["eos_token_id"] = None
    with torch.no_grad():
        out = hf_model.generate(
            ids, max_new_tokens=n_new, do_sample=False, num_beams=width,
            num_return_sequences=n_ret or width,
            length_penalty=length_penalty, early_stopping=early_stopping,
            use_cache=True, pad_token_id=0, **kwargs)
    return [row[len(prompt_ids):].tolist() for row in out]


def test_beam_matches_hf_no_eos(tiny_qwen2):
    """Beam width 3, EOS disabled: pure top-W expansion to max_tokens."""
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model)
    rng = np.random.default_rng(1)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=7).tolist()},
               {"prompt_token_ids": rng.integers(3, 250, size=12).tolist()}]
    params = SamplingParams(use_beam_search=True, best_of=3, n=3,
                            temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(prompts, params)
    for p, o in zip(prompts, outs):
        ref = hf_beam(hf_model, p["prompt_token_ids"], 6, width=3,
                      ignore_eos=True)
        got = [c.token_ids for c in o.outputs]
        assert got == ref, (got, ref)


def test_beam_matches_hf_with_eos(tiny_qwen2):
    """Beam width 4 with a reachable EOS: hypotheses finish on EOS and
    length-penalized scores pick the returned set (HF parity incl. the
    trailing EOS that HF's finalize appends)."""
    import torch

    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    rng = np.random.default_rng(3)
    # pick an EOS the model actually emits soon under beam search: probe
    # greedily for a token that appears in early beam continuations
    prompt = rng.integers(3, 250, size=5).tolist()
    probe = hf_greedy(hf_model, prompt, 3)
    eos = probe[1]  # token the greedy path emits at step 2

    llm = make_llm(hf_model, hf_config=dict(tiny_qwen2_config(),
                                            eos_token_id=eos))
    for lp, es in [(1.0, False), (2.0, False), (1.0, True)]:
        with torch.no_grad():
            ids = torch.tensor([prompt])
            ref_out = hf_model.generate(
                ids, max_new_tokens=8, do_sample=False, num_beams=4,
                num_return_sequences=2, length_penalty=lp,
                early_stopping=es, use_cache=True, pad_token_id=0,
                eos_token_id=eos)
        ref = [row[len(prompt):].tolist() for row in ref_out]
        # HF pads rows to equal length with pad_token_id after EOS
        ref = [r[:r.index(eos) + 1] if eos in r else r for r in ref]

        params = SamplingParams(use_beam_search=True, best_of=4, n=2,
                                temperature=0.0, max_tokens=8,
                                length_penalty=lp, early_stopping=es)
        outs = llm.generate([{"prompt_token_ids": prompt}], params)
        got = [c.token_ids for c in outs[0].outputs]
        assert got == ref, (lp, es, got, ref)


def test_beam_batched_with_regular_requests(tiny_qwen2):
    """A beam request batched alongside greedy requests: both correct."""
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model)
    rng = np.random.default_rng(5)
    p_beam = {"prompt_token_ids": rng.integers(3, 250, size=6).tolist()}
    p_greedy = {"prompt_token_ids": rng.integers(3, 250, size=9).tolist()}
    outs = llm.generate(
        [p_beam, p_greedy],
        [SamplingParams(use_beam_search=True, best_of=2, n=2,
                        temperature=0.0, max_tokens=5, ignore_eos=True),
         SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)])
    ref_beam = hf_beam(hf_model, p_beam["prompt_token_ids"], 5, width=2,
                       ignore_eos=True)
    assert [c.token_ids for c in outs[0].outputs] == ref_beam
    assert outs[1].outputs[0].token_ids == hf_greedy(
        hf_model, p_greedy["prompt_token_ids"], 5)


def test_best_of_returns_top_n(tiny_qwen2):
    """best_of=4, n=2 without beam search: 4 seeded random samples, the 2
    with highest cumulative logprob returned, best first (reference:
    decoding/schema/engine_io.py:159-171 + sampling_params best_of)."""
    from light_vllm_tpu import SamplingParams

    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model)
    rng = np.random.default_rng(7)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=8).tolist()}
    outs = llm.generate([prompt], SamplingParams(
        n=2, best_of=4, temperature=1.0, seed=123, max_tokens=6,
        ignore_eos=True))
    comps = outs[0].outputs
    assert len(comps) == 2
    lps = [c.cumulative_logprob for c in comps]
    assert lps == sorted(lps, reverse=True)
    # compare against n=4 run with the same seed: the returned pair must
    # be the top-2 of the full candidate set
    outs4 = llm.generate([prompt], SamplingParams(
        n=4, best_of=4, temperature=1.0, seed=123, max_tokens=6,
        ignore_eos=True))
    all_lps = sorted((c.cumulative_logprob for c in outs4[0].outputs),
                     reverse=True)
    np.testing.assert_allclose(lps, all_lps[:2], rtol=1e-6)


def test_beam_validation():
    from light_vllm_tpu import SamplingParams

    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=2, temperature=0.7)
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=2, top_k=5)
    with pytest.raises(ValueError):
        SamplingParams(n=3, best_of=2)
