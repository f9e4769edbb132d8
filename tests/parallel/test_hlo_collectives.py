"""Assert the lowered TP step contains exactly the INTENDED collectives
(VERDICT r4 #5b): psums where the layer math needs them, and no
all-gather ever touching the KV pages buffer — an accidental KV gather
would pass the dryrun (numerics identical) and destroy multi-chip
bandwidth.

Manual-TP design under test (parallel/manual.py + decoding/worker.py
_jit_step): activations replicated across tp shards; each layer runs
column-parallel qkv/gate-up and row-parallel o/down with ONE psum after
each row-parallel matmul -> 2 all-reduces per layer, plus the
vocab-parallel embedding's psum and the final-logits psum.
"""

import pytest

import jax


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_tp_step_collective_set():
    from light_vllm_tpu import LLM, SamplingParams
    from tests.decoding.test_generate_e2e import tiny_qwen2_config

    cfg = tiny_qwen2_config()
    cfg.update(num_attention_heads=8, num_key_value_heads=4,
               hidden_size=64)
    layers = cfg["num_hidden_layers"]

    llm = LLM(hf_config=cfg, load_format="dummy", dtype="float32",
              max_model_len=64, block_size=16,
              num_device_blocks_override=32, max_num_seqs=4,
              tensor_parallel_size=4)
    worker = llm.llm_engine.executor.worker
    runner = worker.runner

    # Record the (fn, args) of every step the engine actually executes so
    # we can re-lower the exact serving executable.
    calls = []

    class RecordingCache(dict):
        def __getitem__(self, key):
            fn = super().__getitem__(key)

            def wrapper(*args):
                calls.append((key, fn, args))
                return fn(*args)

            return wrapper

    rec = RecordingCache()
    rec.update(runner._step_cache)
    runner._step_cache = rec

    outs = llm.generate(
        [{"prompt_token_ids": list(range(3, 17))}],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 4
    single_steps = [(k, f, a) for k, f, a in calls if k[0] != "ms"]
    assert single_steps, "no single-step executable was exercised"

    key, fn, args = single_steps[-1]
    text = fn.lower(*args).compile().as_text()

    n_ar = text.count("all-reduce(") + text.count("all-reduce-start(")
    n_ag = text.count("all-gather(") + text.count("all-gather-start(")

    # Expected psum sites: 2 per layer (row-parallel o-proj + down-proj)
    # + 1 vocab-parallel embedding. With LVT_SCAN_LAYERS the per-layer
    # pair appears ONCE inside the scan (while-loop) body, executed L
    # times — so the static count is 3, not 2L+1.
    scan = bool(getattr(runner.model, "scan_layers", False))
    expect = 3 if scan else 2 * layers + 1
    assert expect <= n_ar <= expect + 4, \
        f"expected ~{expect} all-reduces (scan={scan}), HLO has {n_ar}"

    # The ONE legitimate all-gather is the vocab-parallel LM head's
    # logits gather ([T, V/tp] -> [T, V], layers/embedding.py:87). No
    # all-gather may touch the KV pages buffer: its slot dimension is
    # unique in the program (num_blocks * block_size = 512 slots).
    kv = worker.cache_engine.kv_caches
    arr = kv if not isinstance(kv, list) else kv[0]
    slot_dim = str(arr.shape[-3])  # [L, slots, heads, d] or [slots, ...]
    offender = [line for line in text.splitlines()
                if "all-gather" in line and f",{slot_dim}," in
                line.replace(" ", "")]
    assert not offender, f"all-gather touches KV-shaped buffer: {offender[:2]}"
    assert n_ag <= 2, f"unexpected all-gathers in tp-only step: {n_ag}"
    llm.shutdown()
