"""Prequantized FP8 checkpoint ingestion (compressed-tensors + fbgemm_fp8):
fp8 `.weight` + `.weight_scale` tensors load value-exact into the fp8
method — no host requantization (reference:
backends/quantization/compressed_tensors/compressed_tensors.py:1-406,
fp8.py:96-180 process_weights_after_loading, weight_utils.py:119
get_quant_config)."""

import json
import os

import numpy as np
import pytest

from tests.decoding.test_generate_e2e import tiny_qwen2, tiny_qwen2_config  # noqa: F401

FP8_MAX = 448.0


def _quantize_per_channel(w_out_in: "np.ndarray"):
    """[out, in] f32 → (fp8 [out, in], scale [out, 1]) — what
    llm-compressor writes for strategy=channel."""
    import ml_dtypes

    amax = np.abs(w_out_in).max(axis=1, keepdims=True)
    scale = np.maximum(amax / FP8_MAX, 1e-12).astype(np.float32)
    q = np.clip(w_out_in / scale, -FP8_MAX, FP8_MAX)
    return q.astype(ml_dtypes.float8_e4m3fn), scale


def _ct_quant_config():
    return {
        "quant_method": "compressed-tensors",
        "format": "float-quantized",
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {"type": "float", "num_bits": 8,
                            "strategy": "channel", "symmetric": True,
                            "dynamic": False},
                "input_activations": {"type": "float", "num_bits": 8,
                                      "dynamic": True},
            }
        },
        "ignore": ["lm_head"],
    }


@pytest.fixture
def fp8_checkpoint(tiny_qwen2, tmp_path):  # noqa: F811
    """Tiny Qwen2 written as a synthetic compressed-tensors FP8 checkpoint:
    every decoder-layer linear stored as fp8 weight + weight_scale;
    embeddings / lm_head / norms stay f32."""
    import torch
    from safetensors.torch import save_file

    cfg, hf_model = tiny_qwen2
    sd = hf_model.state_dict()
    out = {}
    for name, t in sd.items():
        arr = t.detach().numpy()
        if ".layers." in name and name.endswith(".weight") and arr.ndim == 2 \
                and "norm" not in name:
            q, scale = _quantize_per_channel(arr.astype(np.float32))
            out[name] = torch.from_numpy(q.view(np.uint8)).view(
                torch.float8_e4m3fn)
            out[name.replace(".weight", ".weight_scale")] = \
                torch.from_numpy(scale)
        else:
            out[name] = t.detach().contiguous()
    save_file(out, str(tmp_path / "model.safetensors"))
    cfg_d = json.loads(cfg.to_json_string())
    cfg_d["architectures"] = ["Qwen2ForCausalLM"]
    cfg_d["quantization_config"] = _ct_quant_config()
    (tmp_path / "config.json").write_text(json.dumps(cfg_d))
    return str(tmp_path)


def _llm_kwargs():
    return dict(dtype="float32", max_model_len=128, block_size=16,
                num_device_blocks_override=128, max_num_seqs=8)


def test_fp8_checkpoint_parity_with_runtime_quant(tiny_qwen2,  # noqa: F811
                                                  fp8_checkpoint):
    """Loading the fp8 checkpoint == quantizing the bf16 weights at load:
    same greedy tokens, and the method is auto-detected from
    quantization_config."""
    from light_vllm_tpu import LLM, SamplingParams
    from light_vllm_tpu.core.processor.tokenizer import NullHFTokenizer

    cfg, hf_model = tiny_qwen2
    rng = np.random.default_rng(3)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=n).tolist()}
               for n in (5, 11)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    # runtime-quantized fp8 from the float state dict (established path)
    llm_rt = LLM(hf_config=tiny_qwen2_config(),
                 state_dict=hf_model.state_dict(), quantization="fp8",
                 **_llm_kwargs())
    ref = [o.outputs[0].token_ids for o in llm_rt.generate(prompts, sp)]

    # prequantized checkpoint; quantization auto-detected (no user flag)
    llm_ck = LLM(model=fp8_checkpoint, tokenizer_override=NullHFTokenizer(),
                 **_llm_kwargs())
    mc = llm_ck.llm_engine.engine_config.model_config
    assert mc.quantization == "fp8"
    got = [o.outputs[0].token_ids for o in llm_ck.generate(prompts, sp)]
    assert got == ref

    # value-exactness: the loaded kernels ARE the checkpoint bytes
    params = llm_ck.llm_engine.executor.worker.runner.params
    import jax.numpy as jnp
    leaves = [x for x in __import__("jax").tree.leaves(params)
              if hasattr(x, "dtype") and x.dtype == jnp.float8_e4m3fn]
    assert leaves, "no fp8 kernels found in loaded params"


def test_fbgemm_fp8_detected():
    from light_vllm_tpu.layers.quant.ingest import detect_hf_quantization

    class Cfg:
        quantization_config = {"quant_method": "fbgemm_fp8",
                               "activation_scale_ub": 1200.0}

    assert detect_hf_quantization(Cfg()) == {"name": "fp8"}


def test_compressed_tensors_int8_detected():
    from light_vllm_tpu.layers.quant.ingest import detect_hf_quantization

    class Cfg:
        quantization_config = {
            "quant_method": "compressed-tensors",
            "config_groups": {"group_0": {"weights": {
                "type": "int", "num_bits": 8, "strategy": "channel",
                "symmetric": True}}},
        }

    assert detect_hf_quantization(Cfg()) == {"name": "int8"}


def test_compressed_tensors_int4_rejected():
    from light_vllm_tpu.layers.quant.ingest import detect_hf_quantization

    class Cfg:
        quantization_config = {
            "quant_method": "compressed-tensors",
            "config_groups": {"group_0": {"weights": {
                "type": "int", "num_bits": 4, "strategy": "group"}}},
        }

    assert detect_hf_quantization(Cfg()) == {}


def _int8_quant_config():
    return {
        "quant_method": "compressed-tensors",
        "format": "int-quantized",
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {"type": "int", "num_bits": 8,
                            "strategy": "channel", "symmetric": True},
                "input_activations": {"type": "int", "num_bits": 8,
                                      "dynamic": True},
            }
        },
        "ignore": ["lm_head"],
    }


@pytest.fixture
def int8_checkpoint(tiny_qwen2, tmp_path):  # noqa: F811
    import torch
    from safetensors.torch import save_file

    cfg, hf_model = tiny_qwen2
    out = {}
    for name, t in hf_model.state_dict().items():
        arr = t.detach().numpy()
        if ".layers." in name and name.endswith(".weight") and arr.ndim == 2 \
                and "norm" not in name:
            k = arr.astype(np.float32)
            amax = np.abs(k).max(axis=1, keepdims=True)
            scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
            q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
            out[name] = torch.from_numpy(q)
            out[name.replace(".weight", ".weight_scale")] = \
                torch.from_numpy(scale)
        else:
            out[name] = t.detach().contiguous()
    save_file(out, str(tmp_path / "model.safetensors"))
    cfg_d = json.loads(cfg.to_json_string())
    cfg_d["architectures"] = ["Qwen2ForCausalLM"]
    cfg_d["quantization_config"] = _int8_quant_config()
    (tmp_path / "config.json").write_text(json.dumps(cfg_d))
    return str(tmp_path)


def test_int8_checkpoint_parity_with_runtime_quant(tiny_qwen2,  # noqa: F811
                                                   int8_checkpoint):
    """int8 compressed-tensors checkpoints load value-exact into the W8A8
    method and match runtime int8 quantization of the float weights."""
    from light_vllm_tpu import LLM, SamplingParams
    from light_vllm_tpu.core.processor.tokenizer import NullHFTokenizer

    cfg, hf_model = tiny_qwen2
    rng = np.random.default_rng(5)
    prompts = [{"prompt_token_ids": rng.integers(3, 250, size=7).tolist()}]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    llm_rt = LLM(hf_config=tiny_qwen2_config(),
                 state_dict=hf_model.state_dict(), quantization="int8",
                 **_llm_kwargs())
    ref = [o.outputs[0].token_ids for o in llm_rt.generate(prompts, sp)]

    llm_ck = LLM(model=int8_checkpoint, tokenizer_override=NullHFTokenizer(),
                 **_llm_kwargs())
    mc = llm_ck.llm_engine.engine_config.model_config
    assert mc.quantization == "int8"
    got = [o.outputs[0].token_ids for o in llm_ck.generate(prompts, sp)]
    assert got == ref


def test_convert_fp8_scalar_scale_broadcast():
    import ml_dtypes

    from light_vllm_tpu.layers.quant.ingest import convert_fp8

    w = np.ones((4, 8), ml_dtypes.float8_e4m3fn)  # [out, in]
    t = convert_fp8(w, np.float32(0.5))
    assert t.kernel.shape == (8, 4) and t.scale.shape == (4,)
    assert np.all(t.scale == 0.5)
