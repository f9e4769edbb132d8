"""Pallas TPU matmul over layer-stacked weights.

Under scan-over-layers, per-layer weights live in [L, K, N] stacks. Slicing
a layer out with XLA dynamic-slice materializes a full per-layer copy every
scan iteration — measured ~20 ms/step on the 1.5B bench model (≈2× the
entire weight-read roofline), because a dot operand must be a real buffer.
This kernel instead reads weight tiles *directly from the stack* in HBM,
with the layer index scalar-prefetched into the BlockSpec index_map — the
TPU equivalent of indexed weight pointers, with zero copies.

Grid (M/mt, N/nt, K/kt), K innermost with an f32 accumulator; Mosaic
pipelines the HBM→VMEM tile fetches. Tile sizes are divisor-picked so no
masking is needed (all model dims in the zoo divide cleanly; callers fall
back to XLA slicing when they don't — see `stacked_matmul_supported`).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_vllm_tpu.ops.fp8_cast import upcast_kernel_operand
from light_vllm_tpu.utils import cdiv


def _pick_tile(dim: int, target: int, align: int):
    """Largest multiple of `align` that divides `dim` and is ≤ target."""
    best = None
    t = align
    while t <= min(dim, target):
        if dim % t == 0:
            best = t
        t += align
    return best


def stacked_matmul_supported(K: int, N: int) -> bool:
    return _pick_tile(K, 2048, 256) is not None and \
        _pick_tile(N, 1024, 256) is not None


# Mosaic's scoped-VMEM stack limit defaults to 16 MiB, far below the
# 128 MiB of physical VMEM on v5e-class chips; we raise it per-kernel via
# CompilerParams(vmem_limit_bytes=_VMEM_LIMIT) instead of shrinking tiles
# (kt 1792->256 on the 1.5B down-proj cost ~40% of prefill throughput).
# The budget the tile picker checks against leaves ~2x slack for the
# compiler's retiling copies the formula can't see (observed 27.8M actual
# vs 22M estimated on the 8B fp8 gate_up).
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_BUDGET = 48 * 1024 * 1024


def _scoped_bytes(mt, kt, nt, x_bytes, w_bytes, o_bytes, quantized):
    """Scoped-VMEM estimate, calibrated against Mosaic's accounting (the
    observed 8B fp8 failure: kt=2048 nt=1024 mt=512 → 27.8M actual vs 22M
    by this formula; the 10M budget leaves that ~1.3x slack)."""
    b = (2 * mt * kt * x_bytes        # x tile, double-buffered
         + 2 * kt * nt * w_bytes      # w tile, double-buffered
         + 2 * mt * nt * 4            # f32 accumulator + dot output
         + 2 * mt * nt * o_bytes)     # out tile
    if quantized:
        b += 2 * kt * nt * 2          # bf16 dequant intermediate + operand copy
    return b


def _pick_tiles(M, K, N, x_bytes, w_bytes, o_bytes, quantized):
    """(mt, kt, nt) divisor tiles whose working set fits scoped VMEM.

    Starts from MXU-friendly maxima (kt 2048, nt 1024, mt 512) and shrinks
    the larger of kt/nt (then mt) until under budget — small models keep
    the big tiles, 8B-class dims (K=4096, N=6144/28672) step down
    automatically instead of failing to compile (kernel-vmem-stack OOM)."""
    kt = _pick_tile(K, 2048, 256)
    nt = _pick_tile(N, 1024, 256)
    assert kt is not None and nt is not None, \
        f"stacked matmul needs tileable dims, got K={K} N={N}"
    mt = min(max(M, 128), 512)
    while _scoped_bytes(mt, kt, nt, x_bytes, w_bytes, o_bytes,
                        quantized) > _VMEM_BUDGET:
        kt2 = _pick_tile(K, kt // 2, 256) if kt > 256 else None
        nt2 = _pick_tile(N, nt // 2, 256) if nt > 256 else None
        if kt2 is not None and (kt >= nt or nt2 is None):
            kt = kt2
        elif nt2 is not None:
            nt = nt2
        elif mt > 128:
            mt //= 2
        else:
            break  # minimal tiles; let the compiler have the final word
    return mt, kt, nt


def _mm_kernel(l_ref, x_ref, w_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stacked_matmul(
    x: jnp.ndarray,        # [M, K]
    w_stack: jnp.ndarray,  # [L, K, N]
    layer_idx,             # scalar i32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ w_stack[layer_idx] without materializing the layer slice."""
    M, K = x.shape
    L, K2, N = w_stack.shape
    assert K == K2, (x.shape, w_stack.shape)
    mt, kt, nt = _pick_tiles(M, K, N, x.dtype.itemsize,
                             w_stack.dtype.itemsize, x.dtype.itemsize,
                             quantized=False)
    M_pad = cdiv(M, mt) * mt
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0)))
    layer_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    nk = K // kt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M_pad // mt, N // nt, nk),
        in_specs=[
            pl.BlockSpec((mt, kt), lambda m, n, k, l: (m, k)),
            pl.BlockSpec((1, kt, nt), lambda m, n, k, l: (l[0], k, n)),
        ],
        out_specs=pl.BlockSpec((mt, nt), lambda m, n, k, l: (m, n)),
        scratch_shapes=[pltpu.VMEM((mt, nt), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_mm_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(layer_arr, x, w_stack)
    return out[:M]


def _qmm_kernel(l_ref, x_ref, w_ref, scale_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # tile dequant on the MXU feed; fp8 takes the bitwise VPU path
    # (Mosaic's emulated convert is ~11 cyc/elem — see ops/fp8_cast.py)
    w = upcast_kernel_operand(w_ref[0], jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stacked_quantized_matmul(
    x: jnp.ndarray,        # [M, K] bf16/f32
    w_stack: jnp.ndarray,  # [L, K, N] fp8/int8
    scale: jnp.ndarray,    # [N] f32 per-output-channel (this layer's)
    layer_idx,             # scalar i32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weight-only-quantized variant: (x @ dequant(w_stack[layer_idx])).

    The weight stays quantized in HBM and VMEM; dequant happens on the
    tile right before the MXU contraction (same contract as
    ops/quant_matmul_pallas.py, plus the stack indexing)."""
    M, K = x.shape
    L, K2, N = w_stack.shape
    assert K == K2 and scale.shape == (N,), (x.shape, w_stack.shape,
                                             scale.shape)
    mt, kt, nt = _pick_tiles(M, K, N, x.dtype.itemsize,
                             w_stack.dtype.itemsize, x.dtype.itemsize,
                             quantized=True)
    M_pad = cdiv(M, mt) * mt
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0)))
    layer_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    nk = K // kt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M_pad // mt, N // nt, nk),
        in_specs=[
            pl.BlockSpec((mt, kt), lambda m, n, k, l: (m, k)),
            pl.BlockSpec((1, kt, nt), lambda m, n, k, l: (l[0], k, n)),
            pl.BlockSpec((nt,), lambda m, n, k, l: (n,)),
        ],
        out_specs=pl.BlockSpec((mt, nt), lambda m, n, k, l: (m, n)),
        scratch_shapes=[pltpu.VMEM((mt, nt), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(layer_arr, x, w_stack, scale)
    return out[:M]


# --- gated-MLP epilogue fusion (gate_up matmul + SwiGLU in one kernel) ----
#
# The merged gate_up projection produces [M, 2I] and the activation
# silu(gate) * up immediately re-reads it — ~150 MB of HBM traffic per
# layer at M=2048, I=8960, measured ~0.16 ms/layer (slice_multiply
# fusions) on top of the matmul's own output write. Computing BOTH halves
# inside one kernel (two accumulators per tile; the up half's weight tile
# sits I/nt blocks to the right in the same stack) emits only the final
# [M, I] activation.

_GATED_EPILOGUES = {
    "silu": lambda g: g * jax.lax.logistic(g),
    "gelu": lambda g: jax.nn.gelu(g, approximate=False),
    "gelu_tanh": lambda g: jax.nn.gelu(g, approximate=True),
}


def _pick_tiles_gated(M, K, I, x_bytes, w_bytes, o_bytes, quantized):
    # nt aligns to 128 lanes (not 256): the gate half I often has no
    # 256-aligned divisor (Qwen2's 8960 -> 896 = 7*128).
    kt = _pick_tile(K, 2048, 256)
    nt = _pick_tile(I, 1024, 128)
    if kt is None or nt is None:
        return None
    mt = min(max(M, 128), 512)

    def scoped(mt, kt, nt):
        b = (2 * mt * kt * x_bytes      # x tile, double-buffered
             + 4 * kt * nt * w_bytes    # gate + up tiles, double-buffered
             + 4 * mt * nt * 4          # two f32 accumulators + dot temps
             + 2 * mt * nt * o_bytes)   # out tile
        if quantized:
            b += 4 * kt * nt * 2        # bf16 dequant intermediates
        return b

    while scoped(mt, kt, nt) > _VMEM_BUDGET:
        kt2 = _pick_tile(K, kt // 2, 256) if kt > 256 else None
        nt2 = _pick_tile(I, nt // 2, 128) if nt > 128 else None
        if kt2 is not None and (kt >= nt or nt2 is None):
            kt = kt2
        elif nt2 is not None:
            nt = nt2
        elif mt > 128:
            mt //= 2
        else:
            break
    return mt, kt, nt


def stacked_matmul_gated_supported(K: int, N2: int, act: str) -> bool:
    return (act in _GATED_EPILOGUES and N2 % 2 == 0
            and _pick_tile(K, 2048, 256) is not None
            and _pick_tile(N2 // 2, 1024, 128) is not None)


def _mm_gated_kernel(l_ref, x_ref, wg_ref, wu_ref, o_ref, accg, accu,
                     *, nk: int, act: str):
    @pl.when(pl.program_id(2) == 0)
    def _():
        accg[...] = jnp.zeros_like(accg)
        accu[...] = jnp.zeros_like(accu)

    x = x_ref[...]
    accg[...] += jax.lax.dot_general(
        x, wg_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    accu[...] += jax.lax.dot_general(
        x, wu_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _():
        o_ref[...] = (_GATED_EPILOGUES[act](accg[...]) * accu[...]
                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def stacked_matmul_gated(
    x: jnp.ndarray,        # [M, K]
    w_stack: jnp.ndarray,  # [L, K, 2I] (gate at [:, :, :I], up at [:, :, I:])
    layer_idx,             # scalar i32
    *,
    act: str = "silu",
    interpret: bool = False,
) -> jnp.ndarray:
    """act(x @ Wg) * (x @ Wu) for the stacked merged gate_up weight."""
    M, K = x.shape
    L, K2, N2 = w_stack.shape
    I = N2 // 2
    assert K == K2 and N2 % 2 == 0, (x.shape, w_stack.shape)
    mt, kt, nt = _pick_tiles_gated(M, K, I, x.dtype.itemsize,
                                   w_stack.dtype.itemsize, x.dtype.itemsize,
                                   quantized=False)
    M_pad = cdiv(M, mt) * mt
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0)))
    layer_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    nk = K // kt
    up_off = I // nt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M_pad // mt, I // nt, nk),
        in_specs=[
            pl.BlockSpec((mt, kt), lambda m, n, k, l: (m, k)),
            pl.BlockSpec((1, kt, nt), lambda m, n, k, l: (l[0], k, n)),
            pl.BlockSpec((1, kt, nt),
                         lambda m, n, k, l: (l[0], k, n + up_off)),
        ],
        out_specs=pl.BlockSpec((mt, nt), lambda m, n, k, l: (m, n)),
        scratch_shapes=[pltpu.VMEM((mt, nt), jnp.float32),
                        pltpu.VMEM((mt, nt), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_mm_gated_kernel, nk=nk, act=act),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, I), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(layer_arr, x, w_stack, w_stack)
    return out[:M]


def _qmm_gated_kernel(l_ref, x_ref, wg_ref, wu_ref, sg_ref, su_ref, o_ref,
                      accg, accu, *, nk: int, act: str):
    @pl.when(pl.program_id(2) == 0)
    def _():
        accg[...] = jnp.zeros_like(accg)
        accu[...] = jnp.zeros_like(accu)

    x = x_ref[...]
    accg[...] += jax.lax.dot_general(
        x, upcast_kernel_operand(wg_ref[0], jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    accu[...] += jax.lax.dot_general(
        x, upcast_kernel_operand(wu_ref[0], jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _():
        g = accg[...] * sg_ref[...].astype(jnp.float32)
        u = accu[...] * su_ref[...].astype(jnp.float32)
        o_ref[...] = (_GATED_EPILOGUES[act](g) * u).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def stacked_quantized_matmul_gated(
    x: jnp.ndarray,        # [M, K] bf16/f32
    w_stack: jnp.ndarray,  # [L, K, 2I] fp8/int8
    scale: jnp.ndarray,    # [2I] f32 per-output-channel
    layer_idx,
    *,
    act: str = "silu",
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    L, K2, N2 = w_stack.shape
    I = N2 // 2
    assert K == K2 and scale.shape == (N2,), (x.shape, w_stack.shape,
                                              scale.shape)
    mt, kt, nt = _pick_tiles_gated(M, K, I, x.dtype.itemsize,
                                   w_stack.dtype.itemsize, x.dtype.itemsize,
                                   quantized=True)
    M_pad = cdiv(M, mt) * mt
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0)))
    layer_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    nk = K // kt
    up_off = I // nt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M_pad // mt, I // nt, nk),
        in_specs=[
            pl.BlockSpec((mt, kt), lambda m, n, k, l: (m, k)),
            pl.BlockSpec((1, kt, nt), lambda m, n, k, l: (l[0], k, n)),
            pl.BlockSpec((1, kt, nt),
                         lambda m, n, k, l: (l[0], k, n + up_off)),
            pl.BlockSpec((nt,), lambda m, n, k, l: (n,)),
            pl.BlockSpec((nt,), lambda m, n, k, l: (n + up_off,)),
        ],
        out_specs=pl.BlockSpec((mt, nt), lambda m, n, k, l: (m, n)),
        scratch_shapes=[pltpu.VMEM((mt, nt), jnp.float32),
                        pltpu.VMEM((mt, nt), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_gated_kernel, nk=nk, act=act),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, I), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(layer_arr, x, w_stack, w_stack, scale, scale)
    return out[:M]
