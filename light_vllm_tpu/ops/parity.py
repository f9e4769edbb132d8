"""On-device kernel parity gate: run every Pallas kernel against its jnp
reference with random inputs ON THE CURRENT DEVICE and report max error.

Mosaic-compiled behavior is known to diverge from interpret mode (an fp8
upcast bug shipped Mosaic-only-broken once), so interpret-mode CPU tests
alone cannot protect a benchmark number. bench.py runs this gate before
timing and refuses to emit a metric when any kernel diverges — the
on-hardware analog of the reference's attention correctness matrix
(reference: tests/prefill_only/attention/test_basic_correctness.py).
"""

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


class KernelParityError(RuntimeError):
    """A Pallas kernel diverged from its jnp reference on this device."""


def _err(got, ref) -> float:
    return float(jnp.max(jnp.abs(jnp.asarray(got, jnp.float32)
                                 - jnp.asarray(ref, jnp.float32))))


def _check_decode_attention(rng, interpret: bool, fp8: bool) -> float:
    from light_vllm_tpu.ops.attention_ref import ragged_paged_attention_ref
    from light_vllm_tpu.ops.paged_attention_pallas import \
        paged_attention_decode

    S, h, kvh, d, page_size = 4, 8, 2, 128, 16
    num_blocks, max_pages = 64, 16
    seq_lens = np.array([1, 17, 60, 128], np.int32)
    qf = rng.standard_normal((S, h, d), dtype=np.float32)
    kvf = rng.standard_normal((num_blocks * page_size, 2 * kvh, d),
                              dtype=np.float32) * 0.25
    block_tables = np.zeros((S, max_pages), np.int32)
    nxt = 1
    for s in range(S):
        for i in range(-(-int(seq_lens[s]) // page_size)):
            block_tables[s, i] = nxt
            nxt += 1
    scale = d ** -0.5
    if fp8:
        q = jnp.asarray(qf, jnp.bfloat16)
        kv = jnp.asarray(kvf, jnp.float8_e4m3fn)
        q_ref, kv_ref = q.astype(jnp.float32), kv.astype(jnp.float32)
        tol = 6e-2
    else:
        q = jnp.asarray(qf, jnp.bfloat16)
        kv = jnp.asarray(kvf, jnp.bfloat16)
        q_ref, kv_ref = q.astype(jnp.float32), kv.astype(jnp.float32)
        tol = 3e-2
    ref = ragged_paged_attention_ref(
        q_ref, kv_ref, jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.arange(S, dtype=jnp.int32), jnp.asarray(seq_lens - 1),
        page_size, scale=scale)
    out = paged_attention_decode(
        q, kv, jnp.asarray(block_tables), jnp.asarray(seq_lens),
        page_size=page_size, scale=scale, interpret=interpret)
    e = _err(out, ref)
    if e > tol:
        raise KernelParityError(
            f"decode attention ({'fp8' if fp8 else 'bf16'} cache): "
            f"max err {e:.4f} > {tol}")
    return e


def _check_prefill_attention(rng, interpret: bool) -> float:
    from light_vllm_tpu.ops.attention_ref import ragged_paged_attention_ref
    from light_vllm_tpu.ops.prefill_attention_pallas import (
        TILE_Q, prefill_paged_attention)

    h, kvh, d, page_size = 8, 2, 128, 16
    num_blocks = 64
    specs = [(0, 140), (37, 100)]  # fresh + chunked continuation
    S, max_pages = 4, 16
    chunk_starts, tiles = [], []
    cursor = 0
    for s, (ctx, qn) in enumerate(specs):
        chunk_starts.append(cursor)
        for t in range(-(-qn // TILE_Q)):
            tiles.append((s, cursor + t * TILE_Q))
        cursor += -(-qn // TILE_Q) * TILE_Q
    T = cursor
    q = jnp.asarray(rng.standard_normal((T, h, d), dtype=np.float32),
                    jnp.bfloat16)
    kv = jnp.asarray(
        rng.standard_normal((num_blocks * page_size, 2 * kvh, d),
                            dtype=np.float32) * 0.25, jnp.bfloat16)
    block_tables = np.zeros((S, max_pages), np.int32)
    seq_lens = np.zeros(S, np.int32)
    ctx_lens = np.zeros(S, np.int32)
    cs_arr = np.zeros(S, np.int32)
    seq_ids = np.full(T, S - 1, np.int32)
    positions = np.zeros(T, np.int32)
    nxt = 1
    for s, (ctx, qn) in enumerate(specs):
        seq_lens[s] = ctx + qn
        ctx_lens[s] = ctx
        cs_arr[s] = chunk_starts[s]
        n = -(-int(seq_lens[s]) // page_size)
        block_tables[s, :n] = np.arange(nxt, nxt + n)
        nxt += n
        for i in range(qn):
            seq_ids[chunk_starts[s] + i] = s
            positions[chunk_starts[s] + i] = ctx + i
    NT = len(tiles)
    tile_seq = np.full(NT, -1, np.int32)
    tile_qstart = np.zeros(NT, np.int32)
    for i, (s, qs) in enumerate(tiles):
        tile_seq[i], tile_qstart[i] = s, qs
    scale = d ** -0.5
    ref = ragged_paged_attention_ref(
        q.astype(jnp.float32), kv.astype(jnp.float32),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.asarray(seq_ids), jnp.asarray(positions), page_size,
        scale=scale)
    out = prefill_paged_attention(
        q, kv, jnp.asarray(tile_seq), jnp.asarray(tile_qstart),
        jnp.asarray(block_tables), jnp.asarray(seq_lens),
        jnp.asarray(ctx_lens), jnp.asarray(cs_arr),
        page_size=page_size, scale=scale, interpret=interpret)
    mask = seq_ids < S - 1
    e = _err(jnp.asarray(out)[mask], jnp.asarray(ref)[mask])
    if e > 3e-2:
        raise KernelParityError(f"ragged prefill attention: max err {e:.4f}")
    return e


def _check_kv_writer(rng, interpret: bool) -> float:
    from light_vllm_tpu.ops.kv_cache import write_kv_to_pages
    from light_vllm_tpu.ops.kv_write_pallas import write_kv_pages_inplace

    L, slots, kvh, d, bs = 2, 25 * 16, 2, 128, 16
    T = 48
    k = jnp.asarray(rng.standard_normal((T, kvh, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((T, kvh, d)), jnp.bfloat16)
    slot_mapping = np.concatenate([
        np.arange(32, 32 + 2 * bs),          # two aligned pages
        np.array([7, 90, 141, 33]),          # singles
        np.arange(160, 160 + T - (2 * bs + 4)),  # partial page
    ]).astype(np.int32)
    base = jnp.asarray(rng.standard_normal((L, slots, 2 * kvh, d)),
                       jnp.bfloat16)
    li = jnp.int32(1)
    want = write_kv_to_pages(base, k, v, jnp.asarray(slot_mapping),
                             layer_idx=li)
    pages, rows = [], []
    i = 0
    sm = slot_mapping
    while i < T:
        s = sm[i]
        if (s % bs == 0 and i + bs <= T
                and all(sm[i + j] == s + j for j in range(bs))):
            pages.append((s, i))
            i += bs
        else:
            rows.append((s, i))
            i += 1
    wp = np.zeros((2, max(len(pages), 1)), np.int32)
    wr = np.zeros((2, max(len(rows), 1)), np.int32)
    for j, (dst, src) in enumerate(pages):
        wp[:, j] = (dst, src)
    for j, (dst, src) in enumerate(rows):
        wr[:, j] = (dst, src)
    counts = jnp.asarray([len(pages), len(rows)], jnp.int32)
    kv = jnp.stack([k, v], axis=2).reshape(T, 2 * kvh, d)
    got = write_kv_pages_inplace(base, kv, counts, jnp.asarray(wp),
                                 jnp.asarray(wr), li, page_size=bs,
                                 interpret=interpret)
    e = _err(got, want)
    if e > 0:
        raise KernelParityError(f"kv page writer: max err {e:.4f} != 0")
    return e


def _check_stacked_matmul(rng, interpret: bool) -> float:
    from light_vllm_tpu.ops.stacked_matmul_pallas import stacked_matmul

    M, K, N, L = 128, 512, 768, 2
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((L, K, N)) * 0.05, jnp.bfloat16)
    got = stacked_matmul(x, w, jnp.int32(1), interpret=interpret)
    ref = jnp.dot(x, w[1], preferred_element_type=jnp.float32)
    e = _err(got, ref)
    if e > 5e-2:
        raise KernelParityError(f"stacked matmul: max err {e:.4f}")
    return e


def _check_stacked_quantized_matmul(rng, interpret: bool,
                                    int8: bool = False) -> float:
    from light_vllm_tpu.ops.stacked_matmul_pallas import \
        stacked_quantized_matmul

    M, K, N, L = 128, 512, 768, 2
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wf = rng.standard_normal((L, K, N)) * 0.05
    amax = np.abs(wf[1]).max(axis=0)
    qmax = 127.0 if int8 else 448.0
    scale = np.maximum(amax / qmax, 1e-12).astype(np.float32)
    wc = np.clip(wf / scale[None, None, :], -qmax, qmax)
    wq = jnp.asarray(np.round(wc), jnp.int8) if int8 \
        else jnp.asarray(wc, jnp.float8_e4m3fn)
    got = stacked_quantized_matmul(x, wq, jnp.asarray(scale), jnp.int32(1),
                                   interpret=interpret)
    ref = jnp.dot(x.astype(jnp.float32),
                  wq[1].astype(jnp.float32) * scale[None, :])
    e = _err(got, ref)
    if e > 8e-2:
        kind = "int8" if int8 else "fp8"
        raise KernelParityError(f"stacked {kind} matmul: max err {e:.4f}")
    return e


def _check_stacked_gated_matmul(rng, interpret: bool) -> float:
    from light_vllm_tpu.ops.stacked_matmul_pallas import (
        stacked_matmul_gated, stacked_matmul_gated_supported)

    M, K, I, L = 128, 512, 256, 2
    if not stacked_matmul_gated_supported(K, 2 * I, "silu"):
        return float("nan")
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((L, K, 2 * I)) * 0.05, jnp.bfloat16)
    got = stacked_matmul_gated(x, w, jnp.int32(1), act="silu",
                               interpret=interpret)
    y = jnp.dot(x, w[1], preferred_element_type=jnp.float32)
    g, u = y[:, :I], y[:, I:]
    ref = jax.nn.silu(g) * u
    e = _err(got, ref)
    if e > 5e-2:
        raise KernelParityError(f"stacked gated matmul: max err {e:.4f}")
    return e


def _check_quant_matmul(rng, interpret: bool) -> float:
    from light_vllm_tpu.ops.quant_matmul_pallas import quantized_matmul

    M, K, N = 128, 512, 512
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wf = rng.standard_normal((K, N)) * 0.05
    amax = np.abs(wf).max(axis=0)
    scale = np.maximum(amax / 448.0, 1e-12).astype(np.float32)
    wq = jnp.asarray(np.clip(wf / scale[None, :], -448, 448),
                     jnp.float8_e4m3fn)
    got = quantized_matmul(x, wq, jnp.asarray(scale), interpret=interpret)
    ref = jnp.dot(x.astype(jnp.float32),
                  wq.astype(jnp.float32) * scale[None, :])
    e = _err(got, ref)
    if e > 8e-2:
        raise KernelParityError(f"fp8 matmul: max err {e:.4f}")
    return e


def _check_grouped_matmul(rng, interpret: bool) -> float:
    from light_vllm_tpu.ops.grouped_matmul import (_reference_grouped_matmul,
                                                   grouped_matmul)

    E, K, N, T = 4, 256, 512, 96
    lhs = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
    rhs = jnp.asarray(rng.standard_normal((E, K, N)) * 0.05, jnp.bfloat16)
    sizes = jnp.asarray([10, 40, 0, 46], jnp.int32)
    got = grouped_matmul(lhs, rhs, sizes, use_pallas=True,
                         interpret=interpret)
    ref = _reference_grouped_matmul(lhs, rhs, sizes)
    e = _err(got, ref)
    if e > 5e-2:
        raise KernelParityError(f"grouped matmul: max err {e:.4f}")
    return e


def _check_fp8_cast(rng, interpret: bool) -> float:
    from light_vllm_tpu.ops.fp8_cast import e4m3_to_bf16

    # exhaustive over all 256 bit patterns
    bits = jnp.arange(256, dtype=jnp.uint8).reshape(2, 128)
    w = jax.lax.bitcast_convert_type(bits, jnp.float8_e4m3fn)
    got = e4m3_to_bf16(w)
    ref = w.astype(jnp.float32).astype(jnp.bfloat16)
    gotn = np.asarray(got, np.float32)
    refn = np.asarray(ref, np.float32)
    # the kernel is documented bitwise-exact EXCEPT the two NaN patterns
    ok = np.isnan(refn) | (gotn == refn)
    if not np.all(ok):
        bad = int(np.sum(~ok))
        raise KernelParityError(f"fp8->bf16 cast: {bad}/256 patterns differ")
    return 0.0


_CHECKS = {
    "decode_attn_bf16": lambda r, i: _check_decode_attention(r, i, False),
    "decode_attn_fp8kv": lambda r, i: _check_decode_attention(r, i, True),
    "prefill_attn": _check_prefill_attention,
    "kv_writer": _check_kv_writer,
    "stacked_matmul": _check_stacked_matmul,
    "stacked_fp8_matmul": _check_stacked_quantized_matmul,
    "stacked_int8_matmul": lambda r, i: _check_stacked_quantized_matmul(
        r, i, int8=True),
    "stacked_gated_matmul": _check_stacked_gated_matmul,
    "fp8_matmul": _check_quant_matmul,
    "grouped_matmul": _check_grouped_matmul,
    "fp8_cast": _check_fp8_cast,
}


def run_kernel_parity(names: Optional[List[str]] = None,
                      interpret: Optional[bool] = None,
                      seed: int = 0) -> Dict[str, float]:
    """Run the kernel parity suite on the current default device.

    Returns {kernel: max_abs_err}; raises KernelParityError on the first
    divergence. interpret=None → compiled on TPU, interpret on CPU."""
    from light_vllm_tpu.platforms import current_platform

    if interpret is None:
        interpret = not current_platform().is_tpu
    results: Dict[str, float] = {}
    for name in (names or list(_CHECKS)):
        rng = np.random.default_rng(seed)
        results[name] = _CHECKS[name](rng, interpret)
        logger.info("kernel parity %s: max err %.2e", name, results[name])
    return results
