"""Engine-level abort: running / waiting / SWAPPED requests abort cleanly
with no block leaks, and survivors still match HF greedy.

The swapped case regression-tests the ADVICE r1 fix (aborting a swapped
group must free its CPU blocks from the CPU allocator, not corrupt the
device allocator)."""

import numpy as np

from tests.decoding.test_generate_e2e import (hf_greedy, make_llm,  # noqa
                                              tiny_qwen2)


def _free_counts(llm):
    bm = llm.llm_engine.scheduler.block_manager
    return (bm.device_allocator.get_num_free_blocks(),
            bm.cpu_allocator.get_num_free_blocks())


def test_abort_running_and_waiting(tiny_qwen2):  # noqa: F811
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model, max_num_seqs=2)
    engine = llm.llm_engine
    free0 = _free_counts(llm)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(3, 250, size=n).tolist() for n in (9, 14, 17)]
    for i, p in enumerate(prompts):
        engine.add_request(str(i), {"prompt_token_ids": p}, sp)
    engine.step()  # request 2 still waiting (max_num_seqs=2)
    engine.abort_request("0")   # running
    engine.abort_request("2")   # waiting
    outs = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
    assert set(outs) == {"1"}
    assert outs["1"] == hf_greedy(hf_model, prompts[1], 12)
    assert _free_counts(llm) == free0, "aborted requests leaked blocks"


def test_abort_swapped_group_frees_cpu_blocks(tiny_qwen2,  # noqa: F811
                                              monkeypatch):
    monkeypatch.setenv("LVT_TEST_ENABLE_ARTIFICIAL_PREEMPT", "1")
    import random

    random.seed(7)
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model, preemption_mode="swap", swap_space=0.001,
                   max_num_seqs=4)
    engine = llm.llm_engine
    sched = engine.scheduler
    free0 = _free_counts(llm)
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    rng = np.random.default_rng(6)
    prompts = [rng.integers(3, 250, size=n).tolist()
               for n in (7, 13, 21, 9, 15, 11)]
    for i, p in enumerate(prompts):
        engine.add_request(str(i), {"prompt_token_ids": p}, sp)

    aborted = None
    outs = {}
    for _ in range(400):
        if not engine.has_unfinished_requests():
            break
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
        if aborted is None and sched.swapped:
            aborted = sched.swapped[0].request_id
            engine.abort_request(aborted)
    assert aborted is not None, \
        "no group was ever swapped — test is vacuous"
    assert aborted not in outs
    for rid, got in outs.items():
        assert got == hf_greedy(hf_model, prompts[int(rid)], 24), rid
    assert _free_counts(llm) == free0, "abort-of-swapped leaked blocks"
