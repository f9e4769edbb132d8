"""Scan-over-layers parity: the lax.scan step (stacked params + stacked KV)
must produce exactly the tokens the unrolled per-layer step produces."""

from tests.decoding.test_generate_e2e import (hf_greedy, make_llm,
                                              tiny_qwen2)  # noqa: F401


def test_scan_matches_unrolled(tiny_qwen2, monkeypatch):  # noqa: F811
    cfg, hf_model = tiny_qwen2
    prompts = [list(range(3, 19)), [7, 8, 9], list(range(50, 80))]

    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    monkeypatch.setenv("LVT_SCAN_LAYERS", "0")
    llm = make_llm(hf_model)
    assert not llm.llm_engine.executor.worker.model.scan_layers
    outs_unrolled = [list(o.outputs[0].token_ids) for o in llm.generate(
        [{"prompt_token_ids": p} for p in prompts], sp)]

    monkeypatch.setenv("LVT_SCAN_LAYERS", "1")
    llm = make_llm(hf_model)
    assert llm.llm_engine.executor.worker.model.scan_layers
    outs_scan = [list(o.outputs[0].token_ids) for o in llm.generate(
        [{"prompt_token_ids": p} for p in prompts], sp)]

    assert outs_scan == outs_unrolled
    # and both match HF greedy
    for p, got in zip(prompts, outs_scan):
        assert got == hf_greedy(hf_model, p, 8)
