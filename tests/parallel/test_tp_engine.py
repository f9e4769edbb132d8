"""Tensor/data-parallel engine execution on the virtual 8-device CPU mesh
(SURVEY.md §4: the fake-mesh analog of the reference's fake-heavy-dep
tests)."""

import numpy as np
import pytest

import jax


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_generate_matches_single_device():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from light_vllm_tpu import LLM, SamplingParams
    from tests.decoding.test_generate_e2e import tiny_qwen2_config

    # kv heads divisible by tp=4
    cfg_d = tiny_qwen2_config()
    cfg_d.update(num_attention_heads=8, num_key_value_heads=4,
                 hidden_size=64)
    cfg = Qwen2Config(**{k: v for k, v in cfg_d.items()
                         if k != "architectures"})
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(cfg).eval()
    prompt = {"prompt_token_ids": list(range(3, 17))}
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    def run(tp, dp):
        llm = LLM(hf_config=cfg_d, state_dict=hf.state_dict(),
                  dtype="float32", max_model_len=64, block_size=16,
                  num_device_blocks_override=32, max_num_seqs=4,
                  tensor_parallel_size=tp, data_parallel_size=dp)
        out = llm.generate([prompt], params)[0].outputs[0].token_ids
        return out

    single = run(1, 1)
    tp4 = run(4, 1)
    tp2dp2 = run(2, 2)
    assert tp4 == single
    assert tp2dp2 == single


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_entrypoint():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
