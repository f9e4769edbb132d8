"""Tensor parallelism with the PALLAS backend (interpret mode) on the
virtual 8-device CPU mesh: the shard_map path that runs on real TPU slices
(VERDICT round-1 item #1 — the Pallas kernels had never executed sharded).

Covers: (a) token parity tp=4 vs single device, (b) the compiled tp>1 step
contains no all-gather of the KV cache (attention stays head-local; the
only collectives are the small activation psums from the o-/down-proj),
(c) manual-SPMD TP keeps the stacked Pallas matmul path enabled
(VERDICT round-2 item #1 — GSPMD TP used to fall back to the ~2x-slower
XLA weight-stack slicing)."""

import re

import jax
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_pallas_parity_and_no_kv_allgather(monkeypatch):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from light_vllm_tpu import LLM, SamplingParams
    from tests.decoding.test_generate_e2e import tiny_qwen2_config

    monkeypatch.setenv("LVT_ATTENTION_BACKEND", "pallas")

    cfg_d = tiny_qwen2_config()
    cfg_d.update(num_attention_heads=8, num_key_value_heads=4,
                 hidden_size=64)
    cfg = Qwen2Config(**{k: v for k, v in cfg_d.items()
                         if k != "architectures"})
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(cfg).eval()
    prompts = [{"prompt_token_ids": list(range(3, 17))},
               {"prompt_token_ids": [5, 9, 2]}]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    def run(tp):
        llm = LLM(hf_config=cfg_d, state_dict=hf.state_dict(),
                  dtype="float32", max_model_len=64, block_size=16,
                  num_device_blocks_override=32, max_num_seqs=4,
                  tensor_parallel_size=tp)
        worker = llm.llm_engine.executor.worker
        assert worker.attn_backend.name == "pallas"
        outs = [o.outputs[0].token_ids
                for o in llm.generate(prompts, params)]
        return outs, worker

    single, _ = run(1)
    tp4, worker = run(4)
    assert tp4 == single
    # tp>1 must take the manual-SPMD path (whole-model shard_map), not
    # the GSPMD fallback that disables the stacked Pallas matmuls.
    assert worker.manual_tp == 4
    from light_vllm_tpu.models import scan_utils
    assert not scan_utils._INDEXED_DISABLED

    # --- HLO check: no all-gather of the KV cache in the tp=4 step ------
    runner = worker.runner
    mi = runner._last_model_input
    key = (mi.use_penalties, mi.use_topkp, mi.num_logprobs,
           mi.has_prompt_tokens, mi.decode_region,
           min(mi.num_prefill_seqs, 1), mi.T, mi.S, mi.NT, mi.P,
           mi.max_out, mi.prompt_len, mi.ban_len, mi.all_greedy,
           mi.has_plp, mi.plp_k, mi.lp_width)
    step_fn = runner._step_cache[key]
    txt = step_fn.lower(runner.params, worker.cache_engine.kv_caches,
                        mi.blob).compile().as_text()

    kv = worker.cache_engine.kv_caches
    kv_elems_per_shard = kv.size // 4  # tp=4 shards
    big_gathers = []
    for line in txt.splitlines():
        if "all-gather" not in line:
            continue
        # result shape like f32[2,512,8,8]
        m = re.search(r"= \w+\[([\d,]+)\]", line)
        if not m:
            continue
        elems = 1
        for x in m.group(1).split(","):
            elems *= int(x)
        if elems >= kv_elems_per_shard:
            big_gathers.append(line.strip())
    assert not big_gathers, big_gathers[:3]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_manual_indexed_params_parity(monkeypatch):
    """Token parity tp=4 vs single device with the stacked-Pallas
    (indexed-params) kernels FORCED on — the configuration that runs on
    real TPU under manual TP. Interpret mode executes the same kernel
    logic per shard, so this validates the per-shard stacked matmuls,
    the load-time qkv/gate_up column shuffle, and the manual collectives
    end to end."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from light_vllm_tpu import LLM, SamplingParams
    from tests.decoding.test_generate_e2e import tiny_qwen2_config

    monkeypatch.setenv("LVT_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("LVT_INDEXED_PARAMS", "1")

    # dims picked so the per-shard (tp=4) kernels still tile: qkv
    # N=1024 -> 256/shard (256-aligned), gate_up 2I=2048 -> I=256/shard
    # (128-lane aligned). K=512 keeps the full kernels tileable too.
    cfg_d = tiny_qwen2_config()
    cfg_d.update(num_attention_heads=8, num_key_value_heads=4,
                 hidden_size=512, intermediate_size=1024,
                 num_hidden_layers=2)
    cfg = Qwen2Config(**{k: v for k, v in cfg_d.items()
                         if k != "architectures"})
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(cfg).eval()
    prompts = [{"prompt_token_ids": list(range(3, 17))},
               {"prompt_token_ids": [5, 9, 2]}]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    def run(tp):
        llm = LLM(hf_config=cfg_d, state_dict=hf.state_dict(),
                  dtype="float32", max_model_len=64, block_size=16,
                  num_device_blocks_override=32, max_num_seqs=4,
                  tensor_parallel_size=tp)
        worker = llm.llm_engine.executor.worker
        outs = [o.outputs[0].token_ids
                for o in llm.generate(prompts, params)]
        return outs, worker

    single, _ = run(1)
    tp4, worker = run(4)
    assert worker.manual_tp == 4
    assert tp4 == single
