"""Deferred-output decode chaining (LVT_DEFER_OUTPUTS): pure-decode
multi-step windows are dispatched back-to-back with the sampled tokens
chained on device; pythonization happens at drain time. Token parity vs
the eager path, including a chain broken mid-run by a late prefill."""

import numpy as np

from tests.decoding.test_generate_e2e import (hf_greedy, make_llm,  # noqa
                                              tiny_qwen2)


def _params(**kw):
    from light_vllm_tpu import SamplingParams

    base = dict(temperature=0.0, max_tokens=40, ignore_eos=True,
                detokenize=False)
    base.update(kw)
    return SamplingParams(**base)


def test_deferred_greedy_parity(tiny_qwen2, monkeypatch):  # noqa: F811
    cfg, hf_model = tiny_qwen2
    rng = np.random.default_rng(21)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=n).tolist()}
               for n in (9, 14, 6, 17)]

    def run(defer):
        monkeypatch.setenv("LVT_DEFER_OUTPUTS", "1" if defer else "0")
        llm = make_llm(hf_model, scheduling="async",
                       num_scheduler_steps=4, max_num_seqs=4)
        outs = llm.generate(prompts, _params())
        eng = llm.llm_engine
        eng.shutdown()
        return ([list(o.outputs[0].token_ids) for o in outs],
                eng._defer_count)

    eager, n0 = run(False)
    deferred, n1 = run(True)
    assert n0 == 0 and n1 > 0, (n0, n1)
    assert deferred == eager
    for p, got in zip(prompts, eager):
        assert got == hf_greedy(hf_model, p["prompt_token_ids"], 40)


def test_deferred_chain_broken_by_late_prefill(tiny_qwen2,  # noqa: F811
                                               monkeypatch):
    """A request added mid-chain forces a drain (the next batch is a mixed
    prefill, not a chained continuation) — all outputs must stay exact."""
    monkeypatch.setenv("LVT_DEFER_OUTPUTS", "1")
    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model, scheduling="async",
                   num_scheduler_steps=4, max_num_seqs=4)
    eng = llm.llm_engine
    rng = np.random.default_rng(22)
    prompts = [rng.integers(3, 250, size=n).tolist() for n in (9, 14, 11)]
    sp = _params()
    for i, p in enumerate(prompts[:2]):
        eng.add_request(str(i), {"prompt_token_ids": p}, sp)
    outs = {}
    late_added = False
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
        steps += 1
        if not late_added and eng._defer_count > 0:
            eng.add_request("2", {"prompt_token_ids": prompts[2]}, sp)
            late_added = True
    assert late_added, "chain never engaged before the late add"
    assert set(outs) == {"0", "1", "2"}
    for rid, got in outs.items():
        assert got == hf_greedy(hf_model, prompts[int(rid)], 40), rid


def test_deferred_with_artificial_preemption(tiny_qwen2,  # noqa: F811
                                             monkeypatch):
    """RECOMPUTE preemption mid-chain: the re-prefill reads token VALUES,
    so the drain (triggered by the composition change) must have
    backfilled the placeholders first."""
    monkeypatch.setenv("LVT_DEFER_OUTPUTS", "1")
    monkeypatch.setenv("LVT_TEST_ENABLE_ARTIFICIAL_PREEMPT", "1")
    import random

    random.seed(99)
    cfg, hf_model = tiny_qwen2
    llm = make_llm(hf_model, scheduling="async",
                   num_scheduler_steps=4, max_num_seqs=4)
    rng = np.random.default_rng(24)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=n).tolist()}
               for n in (9, 14, 6, 17)]
    outs = llm.generate(prompts, _params())
    eng = llm.llm_engine
    assert eng.scheduler.num_cumulative_preemption > 0, "no preemption"
    assert eng._defer_count > 0, "no deferral"
    for p, o in zip(prompts, outs):
        assert list(o.outputs[0].token_ids) == \
            hf_greedy(hf_model, p["prompt_token_ids"], 40)
    eng.shutdown()


def test_deferred_sampled_seeded_parity(tiny_qwen2, monkeypatch):  # noqa
    """Seeded random sampling is device-side and value-independent for the
    host — deferral must not change the sampled stream."""
    cfg, hf_model = tiny_qwen2
    rng = np.random.default_rng(23)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=9).tolist()}]

    def run(defer):
        monkeypatch.setenv("LVT_DEFER_OUTPUTS", "1" if defer else "0")
        llm = make_llm(hf_model, scheduling="async",
                       num_scheduler_steps=4, max_num_seqs=4)
        outs = llm.generate(prompts, _params(temperature=0.8, seed=7,
                                             top_p=0.9))
        n = llm.llm_engine._defer_count
        llm.llm_engine.shutdown()
        return [list(o.outputs[0].token_ids) for o in outs], n

    eager, _ = run(False)
    deferred, n1 = run(True)
    assert n1 > 0
    assert deferred == eager
