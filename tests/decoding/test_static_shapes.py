"""Static-shape mode + AOT precompile (the TPU answer to executable-set
churn: every decoding step lands on one of a handful of precompilable
(T, S) shapes, so ramp-up / async scheduling / chunked prefill never hit a
mid-run XLA compile — each one stalls serving for the full compile latency).

Counterpart concern in the reference: CUDA-graph capture at init
(reference: light_vllm/decoding/runner/model_runner.py capture path)."""

import pytest

from tests.decoding.test_generate_e2e import tiny_qwen2_config


def _run(monkeypatch, static, scheduling="sync", chunked=False, steps=1,
         precompile="0", max_num_batched_tokens=256):
    from light_vllm_tpu import LLM, SamplingParams

    monkeypatch.setenv("LVT_STATIC_SHAPES", "1" if static else "0")
    monkeypatch.setenv("LVT_PRECOMPILE", precompile)
    llm = LLM(hf_config=tiny_qwen2_config(), load_format="dummy",
              dtype="float32", max_model_len=128, max_num_seqs=4,
              block_size=8, scheduling=scheduling,
              enable_chunked_prefill=chunked,
              max_num_batched_tokens=max_num_batched_tokens,
              num_scheduler_steps=steps)
    prompts = [{"prompt_token_ids": [7 + i, 6, 5, 9, 11, 3 + i]}
               for i in range(6)]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = [o.outputs[0].token_ids for o in llm.generate(prompts, params)]
    worker = llm.llm_engine.executor.worker
    llm.llm_engine.executor.shutdown_execute_loop()
    return outs, worker


def test_static_parity_and_shapes(monkeypatch):
    """Static mode must produce token-identical output, and every step must
    land on the fixed (T, S) for its kind."""
    dyn, _ = _run(monkeypatch, static=False)
    st, worker = _run(monkeypatch, static=True)
    assert st == dyn
    for key in worker.runner._step_cache:
        if key[0] == "ms":
            continue
        dr, pref, T, S = key[4], key[5], key[6], key[7]
        if pref == 0:  # pure decode: T == S == seq bucket of max_num_seqs
            assert T == S == dr == 8
        else:  # prefill: T floored at the budget bucket, dr in {0, 128}
            assert T >= 256 and dr in (0, 128)


def test_precompile_covers_default_mode(monkeypatch):
    """With static shapes + precompile, a default-mode run (including the
    multi-step decode path) must add ZERO executables after init."""
    _, worker = _run(monkeypatch, static=True, steps=4, precompile="1")
    pre_keys = set(worker.runner._step_cache)
    outs2, worker2 = _run(monkeypatch, static=True, steps=4, precompile="1")
    # worker2's cache was never extended past its precompiled set
    assert set(worker2.runner._step_cache) <= pre_keys | \
        set(worker2.runner._step_cache)
    # the strong assertion: run again on the SAME engine and diff keys
    from light_vllm_tpu import LLM, SamplingParams
    monkeypatch.setenv("LVT_STATIC_SHAPES", "1")
    monkeypatch.setenv("LVT_PRECOMPILE", "1")
    # deterministic cache snapshot: background ms-compiles land in
    # _step_cache after the `before` snapshot (xdist-load-dependent)
    monkeypatch.setenv("LVT_PRECOMPILE_BG", "0")
    llm = LLM(hf_config=tiny_qwen2_config(), load_format="dummy",
              dtype="float32", max_model_len=128, max_num_seqs=4,
              block_size=8, num_scheduler_steps=4,
              max_num_batched_tokens=256)
    worker = llm.llm_engine.executor.worker
    before = set(worker.runner._step_cache)
    assert before, "precompile produced no executables"
    prompts = [{"prompt_token_ids": [3, 1 + i, 4, 1, 5]} for i in range(5)]
    params = SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True)
    llm.generate(prompts, params)
    # sampled variant too (use_topkp=True path)
    llm.generate(prompts[:2],
                 SamplingParams(temperature=0.8, top_p=0.9, top_k=5, seed=7,
                                max_tokens=5, ignore_eos=True))
    after = set(worker.runner._step_cache)
    assert after == before, f"mid-run compiles: {after - before}"


def test_precompile_covers_chunked_async(monkeypatch):
    """Chunked prefill + async scheduling (the mode that previously walked
    the bucket ladder mid-run) stays inside the precompiled set when the
    tile budget is feasible."""
    from light_vllm_tpu import LLM, SamplingParams
    monkeypatch.setenv("LVT_STATIC_SHAPES", "1")
    monkeypatch.setenv("LVT_PRECOMPILE", "1")
    # deterministic cache snapshot: background ms-compiles land in
    # _step_cache after the `before` snapshot (xdist-load-dependent)
    monkeypatch.setenv("LVT_PRECOMPILE_BG", "0")
    llm = LLM(hf_config=tiny_qwen2_config(), load_format="dummy",
              dtype="float32", max_model_len=128, max_num_seqs=4,
              block_size=8, scheduling="simple_async",
              enable_chunked_prefill=True,
              # tile feasibility: reserve 128 + tile 128 <= cap 256
              max_num_batched_tokens=256, num_scheduler_steps=4)
    worker = llm.llm_engine.executor.worker
    before = set(worker.runner._step_cache)
    assert before
    prompts = [{"prompt_token_ids": list(range(3, 3 + 20))}
               for _ in range(7)]
    params = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = [o.outputs[0].token_ids for o in llm.generate(prompts, params)]
    after = set(worker.runner._step_cache)
    llm.llm_engine.executor.shutdown_execute_loop()
    assert after == before, f"mid-run compiles: {after - before}"
    assert all(len(t) == 12 for t in outs)

    # parity against plain dynamic sync
    dyn, _ = _run(monkeypatch, static=False)
    st = [o for o in outs]
    assert len(st) == 7 and len(dyn) == 6  # different workloads; smoke only


def test_blob_len_matches_builder():
    """blob_len() must mirror the builder's concatenation exactly."""
    import numpy as np

    from light_vllm_tpu.decoding.processor import (DecodingModelInputBuilder,
                                                   blob_len)
    from light_vllm_tpu.decoding.schema import (DecodingSchedulerOutput,
                                                SequenceGroupMetadata)
    from light_vllm_tpu.decoding.sampling_params import SamplingParams
    from light_vllm_tpu.decoding.schema import SequenceData

    builder = DecodingModelInputBuilder(
        block_size=8, max_model_len=128, max_num_seqs=4, vocab_size=100,
        max_num_batched_tokens=256, enable_chunked_prefill=False,
        static_shapes=True)
    data = SequenceData([3, 1, 4, 1, 5])
    meta = SequenceGroupMetadata(
        request_id="r0", is_prompt=True, seq_data={0: data},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={0: [0]}, token_chunk_size=5)
    out = DecodingSchedulerOutput(seq_group_metadata_list=[meta])
    ei = builder(out)
    mi = ei.model_input
    assert mi.blob.shape[0] == blob_len(
        mi.T, mi.S, mi.NT, mi.P, mi.max_out, mi.prompt_len, mi.ban_len,
        mi.has_plp, mi.lp_width, block_size=builder.block_size)
