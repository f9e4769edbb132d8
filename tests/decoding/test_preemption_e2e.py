"""Engine-level preemption + prefix-caching stress tests (VERDICT r1 #7;
reference fault-injection pattern: decoding/scheduler.py:22-26
ENABLE_ARTIFICIAL_PREEMPT + benchmarks/test_preemption_mode.py)."""

import numpy as np
import pytest

from tests.decoding.test_generate_e2e import (hf_greedy, make_llm,  # noqa
                                              tiny_qwen2)


def _prompts(rng, n, lens):
    return [{"prompt_token_ids": rng.integers(3, 250,
                                              size=lens[i % len(lens)]
                                              ).tolist()}
            for i in range(n)]


def _greedy_refs(hf_model, prompts, n_new):
    return [hf_greedy(hf_model, p["prompt_token_ids"], n_new)
            for p in prompts]


@pytest.mark.parametrize("mode", ["recompute", "swap"])
def test_artificial_preemption_greedy_parity(tiny_qwen2, mode,  # noqa: F811
                                             monkeypatch):
    """Artificial preemption fires ~50% of decode schedules; outputs must
    still match exact HF greedy for both preemption modes — proving the
    scheduler→block-manager→CacheEngine recompute/swap paths preserve KV
    semantics end-to-end."""
    monkeypatch.setenv("LVT_TEST_ENABLE_ARTIFICIAL_PREEMPT", "1")
    import random

    random.seed(12345)
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    llm = make_llm(hf_model, preemption_mode=mode, swap_space=0.001,
                   max_num_seqs=4)
    rng = np.random.default_rng(11)
    prompts = _prompts(rng, 6, [7, 13, 21])
    n_new = 10
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=n_new, ignore_eos=True))
    sched = llm.llm_engine.scheduler
    assert sched.num_cumulative_preemption > 0, \
        "artificial preemption never fired — test is vacuous"
    refs = _greedy_refs(hf_model, prompts, n_new)
    for out, ref in zip(outs, refs):
        assert out.outputs[0].token_ids == ref


def test_memory_pressure_preemption_parity(tiny_qwen2):  # noqa: F811
    """Genuinely tight KV pool (no artificial hook): decodes must preempt
    (RECOMPUTE) under pressure and still match HF greedy."""
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    # 6 seqs each grow to ceil((21+16)/16)=3 blocks = 18 needed at the
    # decode high-water mark; 15 blocks (incl. the reserved null block)
    # forces victims to be preempted and recomputed.
    llm = make_llm(hf_model, num_device_blocks_override=15,
                   max_num_seqs=6)
    rng = np.random.default_rng(13)
    prompts = _prompts(rng, 6, [21])
    n_new = 16
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=n_new, ignore_eos=True))
    sched = llm.llm_engine.scheduler
    assert sched.num_cumulative_preemption > 0, \
        "KV pool was not tight enough to force preemption"
    refs = _greedy_refs(hf_model, prompts, n_new)
    for out, ref in zip(outs, refs):
        assert out.outputs[0].token_ids == ref


def test_prefix_caching_e2e_parity_and_hits(tiny_qwen2):  # noqa: F811
    """Second wave of requests sharing a 32-token prefix: identical output
    to the non-cached engine AND the block manager records lookup hits
    (reference: prefix_caching_block.py + get_prefix_cache_hit_rate)."""
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import SamplingParams

    rng = np.random.default_rng(17)
    shared = rng.integers(3, 250, size=32).tolist()
    prompts = [{"prompt_token_ids": shared + rng.integers(
        3, 250, size=6).tolist()} for _ in range(3)]
    n_new = 8
    sp = SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True)

    llm = make_llm(hf_model, enable_prefix_caching=True)
    # Wave 1 computes + publishes the prefix; wave 2 must hit it.
    first = llm.generate([prompts[0]], sp)
    rest = llm.generate(prompts[1:], sp)
    bm = llm.llm_engine.scheduler.block_manager
    assert bm.get_prefix_cache_hit_rate() > 0.0
    refs = _greedy_refs(hf_model, prompts, n_new)
    for out, ref in zip(list(first) + list(rest), refs):
        assert out.outputs[0].token_ids == ref
