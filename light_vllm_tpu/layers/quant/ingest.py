"""Prequantized checkpoint ingestion — GPTQ / AWQ tensor formats.

The reference consumes GPTQ/AWQ checkpoints through per-format CUDA GEMMs
(reference: csrc/quantization/gptq/q_gemm.cu, csrc/quantization/awq/gemm_kernels.cu
and the marlin repack path, SURVEY.md §2.7). On TPU both formats funnel into
the one asymmetric uint4 layout of layers/quant/int4.py: the converters here
are pure-numpy bit unpacking run once at load time, value-exact (no
requantization) for the common `desc_act=False` case.

Checkpoint tensor shapes (bits=4, pack_factor=8 nibbles per int32):

  GPTQ   qweight [in/8, out] int32   nibbles packed along the INPUT dim
         qzeros  [in/g, out/8] int32 (stored as zero-1: dequant adds 1)
         scales  [in/g, out]  f16
         g_idx   [in] int32          row -> group map (desc_act)
  AWQ    qweight [in, out/8] int32   nibbles packed along the OUTPUT dim in
         qzeros  [in/g, out/8] int32 AWQ interleaved order [0,2,4,6,1,3,5,7]
         scales  [in/g, out]  f16

Dequant semantics both: w[i, o] = (q[i, o] - zero[i//g, o]) * scale[i//g, o].
"""

from dataclasses import dataclass
from typing import Dict, List, Sequence, Union

import numpy as np

from light_vllm_tpu.layers.quant.int4 import pack_uint4
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

QUANT_SUFFIXES = (".qweight", ".qzeros", ".scales", ".g_idx")


@dataclass
class QTensor:
    """Host-side quantized kernel in our int4 layout, pre-placement.

    packed [in/2, out] int8 (uint4 pairs), scale/zero [in/g, out] f32.
    Flows through model load_weights in place of the float [in, out] kernel.
    """
    packed: np.ndarray
    scale: np.ndarray
    zero: np.ndarray

    @property
    def in_features(self) -> int:
        return self.packed.shape[0] * 2

    @property
    def group_size(self) -> int:
        return self.in_features // self.scale.shape[0]

    def to_params(self) -> Dict[str, np.ndarray]:
        return {"kernel": self.packed, "scale": self.scale,
                "zero": self.zero}


@dataclass
class Fp8Tensor:
    """Host-side channel-quantized kernel in our layout, pre-placement:
    kernel [in, out] (float8_e4m3fn or int8) + per-output-channel f32
    scale [out] — exactly what Fp8LinearMethod / Int8LinearMethod
    create_specs declare, so ingestion is value-exact (no
    requantization). Built from compressed-tensors / fbgemm_fp8
    checkpoints' `.weight` (1-byte [out, in]) + `.weight_scale`
    (reference:
    backends/quantization/compressed_tensors/compressed_tensors.py:1-406,
    fp8.py:96-180 process_weights_after_loading)."""

    kernel: np.ndarray  # [in, out] fp8
    scale: np.ndarray   # [out] f32

    def to_params(self) -> Dict[str, np.ndarray]:
        return {"kernel": self.kernel, "scale": self.scale}


def concat_cols(parts: Sequence[Union[np.ndarray, QTensor, Fp8Tensor]]
                ) -> Union[np.ndarray, QTensor, Fp8Tensor]:
    """Concatenate kernels along the output dim — the stacked-param merge
    (q,k,v / gate,up) working for float and quantized kernels alike."""
    if isinstance(parts[0], QTensor):
        assert all(isinstance(p, QTensor) for p in parts)
        return QTensor(
            packed=np.concatenate([p.packed for p in parts], axis=1),
            scale=np.concatenate([p.scale for p in parts], axis=1),
            zero=np.concatenate([p.zero for p in parts], axis=1))
    if isinstance(parts[0], Fp8Tensor):
        assert all(isinstance(p, Fp8Tensor) for p in parts)
        return Fp8Tensor(
            kernel=np.concatenate([p.kernel for p in parts], axis=1),
            scale=np.concatenate([p.scale for p in parts], axis=0))
    return np.concatenate(parts, axis=1)


def _unpack_rows(x: np.ndarray) -> np.ndarray:
    """int32 [r, c] → [r*8, c]: nibble j of word r is row 8r+j."""
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    u = x.astype(np.uint32)
    out = (u[:, None, :] >> shifts[None, :, None]) & 0xF  # [r, 8, c]
    return out.reshape(x.shape[0] * 8, x.shape[1]).astype(np.uint8)


def _unpack_cols(x: np.ndarray) -> np.ndarray:
    """int32 [r, c] → [r, c*8]: nibble j of word c is column 8c+j."""
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    u = x.astype(np.uint32)
    out = (u[:, :, None] >> shifts[None, None, :]) & 0xF  # [r, c, 8]
    return out.reshape(x.shape[0], x.shape[1] * 8).astype(np.uint8)


# AWQ packs each int32's nibbles in column order [0, 2, 4, 6, 1, 3, 5, 7];
# after naive shift-unpack the inverse permutation restores logical order.
_AWQ_REVERSE_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])


def _reverse_awq_cols(x: np.ndarray) -> np.ndarray:
    cols = x.shape[1]
    order = (np.arange(cols).reshape(-1, 8)[:, _AWQ_REVERSE_ORDER]
             .reshape(-1))
    return x[:, order]


def convert_gptq(qweight: np.ndarray, qzeros: np.ndarray,
                 scales: np.ndarray, g_idx: np.ndarray = None) -> QTensor:
    q = _unpack_rows(qweight)                       # [in, out] 0..15
    zeros = (_unpack_cols(qzeros).astype(np.float32) + 1.0)  # [ng, out]
    scale = scales.astype(np.float32)
    in_f = q.shape[0]
    ng = scale.shape[0]
    g = in_f // ng
    if g_idx is not None and ng > 1:
        trivial = np.arange(in_f, dtype=np.int64) // g
        if not np.array_equal(np.asarray(g_idx, dtype=np.int64), trivial):
            # desc_act reorders rows across groups: fold the per-row
            # scale/zero in exactly, then requantize symmetric (lossy only
            # in this rare path; reference handles it with gptq_shuffle).
            logger.warning("GPTQ desc_act (non-trivial g_idx): "
                           "requantizing host-side")
            gi = np.asarray(g_idx, dtype=np.int64)
            wf = (q.astype(np.float32) - zeros[gi]) * scale[gi]
            from light_vllm_tpu.layers.quant.int4 import _quantize_sym
            d = _quantize_sym(wf, g)
            return QTensor(d["kernel"], d["scale"], d["zero"])
    return QTensor(pack_uint4(q), scale, zeros)


def convert_awq(qweight: np.ndarray, qzeros: np.ndarray,
                scales: np.ndarray) -> QTensor:
    q = _reverse_awq_cols(_unpack_cols(qweight))    # [in, out]
    zeros = _reverse_awq_cols(_unpack_cols(qzeros)).astype(np.float32)
    scale = scales.astype(np.float32)
    return QTensor(pack_uint4(q), scale, zeros)


def convert_prequantized(tensors: Dict[str, np.ndarray], name: str
                         ) -> QTensor:
    """Convert `{name}.qweight/.qzeros/.scales[/.g_idx]` from a layer's
    staged tensors into a QTensor, auto-detecting GPTQ vs AWQ by shape."""
    qweight = tensors[name + ".qweight"]
    qzeros = tensors[name + ".qzeros"]
    scales = tensors[name + ".scales"]
    if qweight.shape[1] == scales.shape[1]:        # out dims line up → GPTQ
        return convert_gptq(qweight, qzeros, scales,
                            tensors.get(name + ".g_idx"))
    assert qweight.shape[1] * 8 == scales.shape[1], (
        f"unrecognized quantized tensor shapes for {name}: "
        f"qweight {qweight.shape}, scales {scales.shape}")
    return convert_awq(qweight, qzeros, scales)


def convert_fp8(weight: np.ndarray, weight_scale: np.ndarray) -> Fp8Tensor:
    """fp8 `.weight` [out, in] + `.weight_scale` (scalar per-tensor, or
    [out] / [out, 1] per-channel) → Fp8Tensor in our [in, out] layout.
    Value-exact: dequant is q * scale in both conventions."""
    out_features = weight.shape[0]
    scale = np.asarray(weight_scale, np.float32).reshape(-1)
    if scale.size == 1:
        scale = np.full((out_features,), float(scale[0]), np.float32)
    assert scale.shape == (out_features,), (
        f"weight_scale shape {weight_scale.shape} does not broadcast to "
        f"[{out_features}] output channels")
    return Fp8Tensor(kernel=np.ascontiguousarray(weight.T), scale=scale)


def get_kernel(tensors: Dict[str, np.ndarray], name: str
               ) -> Union[np.ndarray, QTensor, Fp8Tensor]:
    """Fetch a linear kernel from staged checkpoint tensors: float
    `.weight` ([out, in] → transposed), prequantized GPTQ/AWQ triple →
    QTensor, or fp8 `.weight` + `.weight_scale` → Fp8Tensor."""
    if name + ".qweight" in tensors:
        return convert_prequantized(tensors, name)
    w = tensors[name + ".weight"]
    if name + ".weight_scale" in tensors and w.dtype.itemsize == 1:
        return convert_fp8(w, tensors[name + ".weight_scale"])
    return w.T


def detect_hf_quantization(hf_config) -> Dict[str, object]:
    """Map an HF `quantization_config` to our method name + kwargs.

    Returns {} when the checkpoint is unquantized (reference analog:
    core/loader/weight_utils.py:119 get_quant_config)."""
    qc = getattr(hf_config, "quantization_config", None)
    if qc is None:
        return {}
    if not isinstance(qc, dict):
        qc = getattr(qc, "to_dict", lambda: vars(qc))()
    method = (qc.get("quant_method") or "").lower()
    if method in ("gptq", "awq"):
        bits = int(qc.get("bits", qc.get("w_bit", 4)))
        if bits != 4:
            raise ValueError(
                f"{method} bits={bits} unsupported (only 4-bit)")
        group = int(qc.get("group_size", qc.get("q_group_size", 128)))
        return {"name": "int4", "group_size": group if group > 0 else 128}
    if method in ("fp8", "fbgemm_fp8"):
        # fbgemm_fp8 stores fp8 .weight + per-channel .weight_scale
        # (+ activation_scale_ub, unused: activations stay bf16 here) —
        # ingested value-exact by get_kernel/convert_fp8 (reference:
        # backends/quantization/fbgemm_fp8.py).
        return {"name": "fp8"}
    if method == "compressed-tensors":
        # llm-compressor FP8 checkpoints: validate the weight scheme is
        # 8-bit float (per-tensor or per-channel); anything else (int8
        # compressed-tensors, grouped, packed sparsity) is unsupported
        # (reference: compressed_tensors.py:1-406 scheme dispatch).
        groups = qc.get("config_groups") or {}
        for gname, grp in groups.items():
            wspec = (grp or {}).get("weights") or {}
            is8 = int(wspec.get("num_bits", 0)) == 8
            chan = wspec.get("strategy") in ("channel", "tensor", None)
            if wspec.get("type") == "float" and is8 and chan:
                if grp.get("input_activations") and not \
                        (grp["input_activations"].get("dynamic", True)):
                    logger.info(
                        "compressed-tensors static input_scale present; "
                        "activations run bf16 on TPU, input scales unused")
                return {"name": "fp8"}
            if (wspec.get("type") == "int" and is8 and chan
                    and wspec.get("symmetric", True)):
                # int8 W8A8: checkpoint .weight int8 [out, in] +
                # weight_scale [out, 1] is exactly Int8LinearMethod's
                # layout after transpose (reference:
                # compressed_tensors/schemes/compressed_tensors_w8a8_int8.py)
                return {"name": "int8"}
            logger.warning(
                "compressed-tensors group %r weight scheme %r unsupported "
                "(8-bit float, or symmetric 8-bit int, per-channel/"
                "per-tensor only); quantized-stored weights cannot load "
                "unquantized", gname, wspec)
            return {}
        return {}
    logger.warning("ignoring unsupported hf quantization_config "
                   "quant_method=%r", method)
    return {}
