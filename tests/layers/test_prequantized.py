"""GPTQ/AWQ prequantized checkpoint ingestion (layers/quant/ingest.py).

Reference packing formats re-implemented here from their public semantics
(reference: csrc/quantization/gptq/q_gemm.cu dequant,
csrc/quantization/awq/dequantize.cuh ordering) and round-tripped through our
converters; then a full LLM.generate over a synthetic GPTQ checkpoint.
"""

import numpy as np
import pytest

from light_vllm_tpu.layers.quant.ingest import (QTensor, convert_awq,
                                                convert_gptq,
                                                detect_hf_quantization)

AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]


def pack_rows_int32(q):  # GPTQ qweight: [in, out] → [in/8, out]
    q = q.astype(np.uint32)
    out = np.zeros((q.shape[0] // 8, q.shape[1]), dtype=np.uint32)
    for j in range(8):
        out |= (q[j::8] & 0xF) << (4 * j)
    return out.view(np.int32)


def pack_cols_int32(q):  # GPTQ qzeros: [r, c] → [r, c/8]
    q = q.astype(np.uint32)
    out = np.zeros((q.shape[0], q.shape[1] // 8), dtype=np.uint32)
    for j in range(8):
        out |= (q[:, j::8] & 0xF) << (4 * j)
    return out.view(np.int32)


def pack_awq_cols(q):  # AWQ: [r, c] → [r, c/8], AWQ nibble order
    q = q.astype(np.uint32)
    out = np.zeros((q.shape[0], q.shape[1] // 8), dtype=np.uint32)
    for k in range(8):
        out |= (q[:, AWQ_ORDER[k]::8] & 0xF) << (4 * k)
    return out.view(np.int32)


def dequant(qt: QTensor) -> np.ndarray:
    from light_vllm_tpu.layers.quant.int4 import unpack_uint4
    q = np.asarray(unpack_uint4(qt.packed), dtype=np.float32)
    g = qt.group_size
    ng = qt.scale.shape[0]
    qg = q.reshape(ng, g, -1)
    return ((qg - qt.zero[:, None, :]) * qt.scale[:, None, :]
            ).reshape(q.shape)


@pytest.mark.parametrize("in_f,out_f,g", [(64, 48, 32), (128, 16, 128)])
def test_gptq_roundtrip(in_f, out_f, g):
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, size=(in_f, out_f))
    ng = in_f // g
    zeros = rng.integers(1, 16, size=(ng, out_f))  # stored z-1 stays in 0..15
    scales = rng.uniform(0.01, 0.1, size=(ng, out_f)).astype(np.float16)

    qweight = pack_rows_int32(q)
    qzeros = pack_cols_int32(zeros - 1)                     # GPTQ stores z-1
    qt = convert_gptq(qweight, qzeros, scales,
                      g_idx=np.arange(in_f) // g)

    want = (q.reshape(ng, g, out_f) - zeros[:, None, :]) \
        * scales.astype(np.float32)[:, None, :]
    np.testing.assert_allclose(dequant(qt), want.reshape(in_f, out_f),
                               rtol=1e-6)


def test_awq_roundtrip():
    rng = np.random.default_rng(1)
    in_f, out_f, g = 64, 64, 32
    q = rng.integers(0, 16, size=(in_f, out_f))
    ng = in_f // g
    zeros = rng.integers(0, 16, size=(ng, out_f))
    scales = rng.uniform(0.01, 0.1, size=(ng, out_f)).astype(np.float16)

    qt = convert_awq(pack_awq_cols(q), pack_awq_cols(zeros), scales)
    want = (q.reshape(ng, g, out_f) - zeros[:, None, :]) \
        * scales.astype(np.float32)[:, None, :]
    np.testing.assert_allclose(dequant(qt), want.reshape(in_f, out_f),
                               rtol=1e-6)


def test_gptq_desc_act_requantizes():
    rng = np.random.default_rng(2)
    in_f, out_f, g = 64, 32, 32
    q = rng.integers(0, 16, size=(in_f, out_f))
    zeros = np.full((2, out_f), 8)
    scales = rng.uniform(0.01, 0.1, size=(2, out_f)).astype(np.float16)
    g_idx = rng.permutation(np.arange(in_f) // g)           # shuffled groups
    qt = convert_gptq(pack_rows_int32(q), pack_cols_int32(zeros - 1),
                      scales, g_idx=g_idx)
    want = (q.astype(np.float32) - zeros[g_idx]) * scales.astype(
        np.float32)[g_idx]
    # requantized symmetric: error bounded by half the new quant step
    # (amax/7/2 ≈ 0.05 at these scales), not exact
    np.testing.assert_allclose(dequant(qt), want, atol=8e-2)


def test_detect_hf_quantization():
    class C:
        quantization_config = {"quant_method": "gptq", "bits": 4,
                               "group_size": 64, "desc_act": False}
    assert detect_hf_quantization(C()) == {"name": "int4", "group_size": 64}

    class A:
        quantization_config = {"quant_method": "awq", "w_bit": 4,
                               "q_group_size": 32}
    assert detect_hf_quantization(A()) == {"name": "int4", "group_size": 32}

    class N:
        pass
    assert detect_hf_quantization(N()) == {}


def _gptq_quantize(w_t: np.ndarray, g: int):
    """Quantize a float [in, out] kernel into GPTQ checkpoint tensors."""
    in_f, out_f = w_t.shape
    ng = in_f // g
    wg = w_t.reshape(ng, g, out_f)
    mx, mn = wg.max(axis=1), wg.min(axis=1)
    scale = np.maximum((mx - mn) / 15.0, 1e-8)
    zero = np.clip(np.round(-mn / scale), 1, 15)
    q = np.clip(np.round(wg / scale[:, None, :]) + zero[:, None, :],
                0, 15).astype(np.uint32)
    return {
        "qweight": pack_rows_int32(q.reshape(in_f, out_f)),
        "qzeros": pack_cols_int32(zero.astype(np.uint32) - 1),
        "scales": scale.astype(np.float16),
        "g_idx": (np.arange(in_f) // g).astype(np.int32),
    }, ((q.astype(np.float32).reshape(ng, g, out_f) - zero[:, None, :])
        * scale[:, None, :]).reshape(in_f, out_f)


def test_gptq_checkpoint_generate_e2e():
    """Synthesize a GPTQ Qwen2 checkpoint; auto-detected int4 engine must
    match an unquantized engine loaded with the dequantized weights."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from light_vllm_tpu import LLM, SamplingParams

    cfg = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=96, max_position_embeddings=128,
               rope_theta=10000.0, rms_norm_eps=1e-6, hidden_act="silu",
               tie_word_embeddings=False)
    hf = Qwen2ForCausalLM(Qwen2Config(**cfg)).eval()
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}

    g = 32
    qsd, dqsd = {}, {}
    for name, arr in sd.items():
        is_linear = name.endswith(".weight") and any(
            s in name for s in ("q_proj", "k_proj", "v_proj", "o_proj",
                                "gate_proj", "up_proj", "down_proj"))
        if not is_linear:
            qsd[name] = torch.from_numpy(arr)
            dqsd[name] = torch.from_numpy(arr)
            continue
        prefix = name[:-len(".weight")]
        tensors, w_dq = _gptq_quantize(arr.T.astype(np.float32), g)
        for suffix, t in tensors.items():
            qsd[f"{prefix}.{suffix}"] = torch.from_numpy(
                np.ascontiguousarray(t))
        dqsd[name] = torch.from_numpy(w_dq.T.astype(np.float32).copy())

    prompts = [{"prompt_token_ids": [5, 6, 7, 8, 9]},
               {"prompt_token_ids": [20, 21, 22]}]
    params = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)

    hf_cfg_q = dict(architectures=["Qwen2ForCausalLM"], **cfg,
                    quantization_config={"quant_method": "gptq", "bits": 4,
                                         "group_size": g, "desc_act": False})
    llm_q = LLM(hf_config=hf_cfg_q, state_dict=qsd, dtype="float32",
                max_model_len=64, max_num_seqs=2, block_size=16)
    out_q = [list(o.outputs[0].token_ids)
             for o in llm_q.generate(prompts, params)]

    llm_f = LLM(hf_config=dict(architectures=["Qwen2ForCausalLM"], **cfg),
                state_dict=dqsd, dtype="float32",
                max_model_len=64, max_num_seqs=2, block_size=16)
    out_f = [list(o.outputs[0].token_ids)
             for o in llm_f.generate(prompts, params)]

    assert out_q == out_f
