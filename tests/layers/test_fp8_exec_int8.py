"""fp8 execution-mode selection (quant/fp8.py fp8_exec_mode): on TPU,
"fp8" checkpoints execute as per-channel int8 by default — the MXU has no
fp8 datapath and the VPU bitwise dequant holds decode matmuls to ~173 GB/s
vs int8's 317 GB/s (measured v5e, see commit). LVT_FP8_EXEC forces either.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from light_vllm_tpu.layers.quant.fp8 import (FP8_MAX, Fp8Config,
                                             Fp8LinearMethod,
                                             fp8_exec_mode)


def test_auto_mode_is_fp8_on_cpu(monkeypatch):
    monkeypatch.delenv("LVT_FP8_EXEC", raising=False)
    assert fp8_exec_mode() == "fp8"  # tests force LVT_PLATFORM=cpu


def test_forced_modes(monkeypatch):
    monkeypatch.setenv("LVT_FP8_EXEC", "int8")
    assert fp8_exec_mode() == "int8"
    assert Fp8Config().get_linear_method().storage == "int8"
    monkeypatch.setenv("LVT_FP8_EXEC", "fp8")
    assert fp8_exec_mode() == "fp8"


@pytest.mark.parametrize("storage", ["fp8", "int8"])
def test_quantize_roundtrip_error_bounded(storage, rng):
    m = Fp8LinearMethod(storage=storage)
    k = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
    qd = m.quantize_host(k)
    assert np.dtype(qd["kernel"].dtype) == np.dtype(
        np.int8 if storage == "int8" else jnp.float8_e4m3fn)
    deq = np.asarray(qd["kernel"], np.float32) * qd["scale"][None, :]
    # per-channel max error <= half a quantization step
    step = qd["scale"] * (2.0 if storage == "int8" else 32.0)
    assert np.all(np.abs(deq - k) <= step[None, :] + 1e-7)


def test_transcode_fp8_to_int8_value_error_bounded(rng):
    """Prequantized e4m3 bits -> int8 storage: error bounded by the int8
    step on the rescaled channel scale."""
    m = Fp8LinearMethod(storage="int8")
    vals = rng.standard_normal((128, 64)).astype(np.float32) * 100
    fp8 = np.clip(vals, -FP8_MAX, FP8_MAX).astype(jnp.float8_e4m3fn)
    scale = (rng.random(64).astype(np.float32) + 0.5) * 1e-2
    out = m.transcode_host({"kernel": fp8, "scale": scale})
    assert out["kernel"].dtype == np.int8
    true = np.asarray(fp8, np.float32) * scale[None, :]
    got = out["kernel"].astype(np.float32) * out["scale"][None, :]
    step = scale * (FP8_MAX / 127.0)
    assert np.all(np.abs(got - true)
                  <= step[None, :] * (0.5 + 1e-4) + 1e-7)
    # fp8 storage: transcode is a no-op
    m8 = Fp8LinearMethod(storage="fp8")
    same = m8.transcode_host({"kernel": fp8, "scale": scale})
    assert same["kernel"] is fp8


def test_engine_generates_under_int8_exec(monkeypatch):
    """End-to-end: quantization='fp8' with LVT_FP8_EXEC=int8 builds int8
    params and generates sane greedy tokens (close to the bf16 model's)."""
    monkeypatch.setenv("LVT_FP8_EXEC", "int8")
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from light_vllm_tpu import LLM
    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    cfg = dict(vocab_size=512, hidden_size=256, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=512, max_position_embeddings=512,
               rms_norm_eps=1e-6, rope_theta=10000.0, hidden_act="silu",
               tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(Qwen2Config(**cfg)).eval()
    llm = LLM(hf_config=dict(architectures=["Qwen2ForCausalLM"], **cfg),
              state_dict=hf.state_dict(), dtype="bfloat16",
              quantization="fp8", max_model_len=128, max_num_seqs=4,
              block_size=16)
    worker = llm.llm_engine.executor.worker
    kernels = [leaf for leaf in _leaves(worker.runner.params)
               if hasattr(leaf, "dtype") and leaf.dtype == jnp.int8]
    assert kernels, "int8 exec mode produced no int8 kernels"
    prompt = [3, 11, 7, 20, 4]
    outs = llm.generate([{"prompt_token_ids": prompt}],
                        SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True, detokenize=False))
    toks = list(outs[0].outputs[0].token_ids)
    assert len(toks) == 8 and all(0 <= t < 512 for t in toks)
    llm.shutdown()


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)
