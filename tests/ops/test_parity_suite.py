"""Kernel parity gate (ops/parity.py): the suite bench.py runs on-device
before emitting a metric. On CPU it runs in interpret mode; the key
property tested here is that a deliberately-broken kernel is CAUGHT
(VERDICT r3 weak #2: a numerically-wrong kernel must not ship a number)."""

import numpy as np
import pytest


def test_suite_passes_on_reference_kernels():
    from light_vllm_tpu.ops.parity import run_kernel_parity

    res = run_kernel_parity()
    assert set(res) >= {"decode_attn_bf16", "decode_attn_fp8kv",
                        "prefill_attn", "kv_writer", "stacked_matmul",
                        "stacked_fp8_matmul", "fp8_matmul",
                        "grouped_matmul", "fp8_cast"}
    for name, err in res.items():
        assert not err > 1.0, (name, err)


def test_broken_kernel_is_caught(monkeypatch):
    """Sabotage the fp8 dequant scale application; the gate must raise."""
    import light_vllm_tpu.ops.quant_matmul_pallas as qmm
    from light_vllm_tpu.ops.parity import (KernelParityError,
                                           run_kernel_parity)

    real = qmm.quantized_matmul

    def broken(x, w, scale, **kw):
        return real(x, w, scale * 1.5, **kw)

    monkeypatch.setattr(qmm, "quantized_matmul", broken)
    with pytest.raises(KernelParityError):
        run_kernel_parity(names=["fp8_matmul"])


def test_broken_attention_is_caught(monkeypatch):
    import light_vllm_tpu.ops.paged_attention_pallas as pa
    from light_vllm_tpu.ops.parity import (KernelParityError,
                                           run_kernel_parity)

    real = pa.paged_attention_decode

    def broken(q, kv, bt, sl, **kw):
        kw["scale"] = kw["scale"] * 2.0
        return real(q, kv, bt, sl, **kw)

    monkeypatch.setattr(pa, "paged_attention_decode", broken)
    with pytest.raises(KernelParityError):
        run_kernel_parity(names=["decode_attn_bf16"])
