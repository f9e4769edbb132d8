"""Quantization method correctness: quantize→apply ≈ float matmul."""

import numpy as np
import pytest

import jax.numpy as jnp

from light_vllm_tpu.layers.linear import ReplicatedLinear
from light_vllm_tpu.layers.quant import get_quantization_config


@pytest.mark.parametrize("method,tol", [("fp8", 0.05), ("int8", 0.05),
                                        ("int4", 0.2)])
def test_quantized_linear_close_to_float(method, tol, rng):
    in_f, out_f, T = 128, 64, 8
    qc = get_quantization_config(method)
    layer = ReplicatedLinear(in_f, out_f, dtype=jnp.float32,
                             quant_method=qc.get_linear_method())
    kernel = rng.standard_normal((in_f, out_f), dtype=np.float32) * 0.1
    raw = layer.maybe_quantize({"kernel": kernel})
    assert "scale" in raw
    params = {k: jnp.asarray(v) for k, v in raw.items()}
    x = rng.standard_normal((T, in_f), dtype=np.float32)
    y = np.asarray(layer(params, jnp.asarray(x)))
    y_ref = x @ kernel
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert rel < tol, f"{method}: rel err {rel}"


def test_quantized_matmul_pallas_interpret(rng):
    from light_vllm_tpu.ops.quant_matmul_pallas import quantized_matmul
    from light_vllm_tpu.layers.quant.fp8 import Fp8LinearMethod

    T, K, N = 16, 256, 256
    m = Fp8LinearMethod()
    kernel = rng.standard_normal((K, N), dtype=np.float32) * 0.1
    q = m.quantize_host(kernel)
    x = rng.standard_normal((T, K), dtype=np.float32).astype(jnp.float32)
    y = np.asarray(quantized_matmul(
        jnp.asarray(x), jnp.asarray(q["kernel"]), jnp.asarray(q["scale"]),
        interpret=True))
    y_ref = np.asarray(x) @ kernel
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert rel < 0.05


def test_e2e_quantized_generate(rng):
    """fp8-quantized tiny Qwen2 still generates (loose parity: same first
    token as float on an easy distribution is not guaranteed; just check
    mechanics + finite outputs)."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from light_vllm_tpu import LLM, SamplingParams
    from tests.decoding.test_generate_e2e import tiny_qwen2_config

    cfg = Qwen2Config(**{k: v for k, v in tiny_qwen2_config().items()
                         if k != "architectures"})
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(cfg).eval()
    llm = LLM(hf_config=tiny_qwen2_config(), state_dict=hf.state_dict(),
              dtype="float32", quantization="fp8", max_model_len=128,
              block_size=16, num_device_blocks_override=64, max_num_seqs=4)
    outs = llm.generate([{"prompt_token_ids": [5, 6, 7, 8]}],
                        SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 8
