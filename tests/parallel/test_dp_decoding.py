"""Decoding data parallelism via engine replicas (VERDICT r1 #8;
reference: prefill_only/executor/gpu_data_parallelism_executor.py:17-81).

Evidence required: each replica's state lives on ITS device only (no
cross-device traffic is possible — disjoint meshes), and dp=2 output
matches the single-engine run token-for-token."""

import numpy as np
import pytest

from tests.decoding.test_generate_e2e import (make_llm,  # noqa: F401
                                              tiny_qwen2,
                                              tiny_qwen2_config)


def llm_kwargs(hf_model):
    return dict(hf_config=tiny_qwen2_config(),
                state_dict=hf_model.state_dict(), dtype="float32",
                max_model_len=128, block_size=16,
                num_device_blocks_override=128, max_num_seqs=8)


def test_dp_replicas_pin_disjoint_devices_and_match(tiny_qwen2):  # noqa
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices (run under the 8-CPU mesh)")
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import DataParallelLLM, SamplingParams

    rng = np.random.default_rng(21)
    prompts = [{"prompt_token_ids": rng.integers(3, 250,
                                                 size=n).tolist()}
               for n in [5, 9, 14, 7, 11]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    ref_llm = make_llm(hf_model)
    refs = [o.outputs[0].token_ids for o in ref_llm.generate(prompts, sp)]

    dp = DataParallelLLM(data_parallel_size=2, **llm_kwargs(hf_model))

    # Placement evidence: each replica's params + KV cache live on its own
    # device and the two device sets are disjoint.
    device_sets = []
    for llm in dp.replicas:
        worker = llm.llm_engine.executor.worker
        leaves = __import__("jax").tree.leaves(worker.runner.params)
        devs = set()
        for leaf in leaves:
            devs |= set(leaf.devices())
        for kv in __import__("jax").tree.leaves(
                worker.cache_engine.kv_caches):
            devs |= set(kv.devices())
        assert len(devs) == 1, devs
        device_sets.append(devs)
    assert device_sets[0].isdisjoint(device_sets[1]), device_sets

    outs = dp.generate(prompts, sp)
    got = [o.outputs[0].token_ids for o in outs]
    assert got == refs


def test_dp_rejects_oversubscription(tiny_qwen2):  # noqa: F811
    import jax

    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import DataParallelLLM

    with pytest.raises(ValueError, match="devices"):
        DataParallelLLM(data_parallel_size=len(jax.devices()) + 1,
                        **llm_kwargs(hf_model))
