"""Isolate the decode paged-attention kernel at the 8B bench shapes.

The 8B fp8 decode step measured 120 ms vs a 9.2 ms weight-read roofline
(benchmarks/profile_8b.py). Hypothesis: per-page DMA issue cost — S=256
seqs x ~9 pages x 32 layers ~= 73k descriptors/step on the scalar core.
This sweeps page_size (and ctx) for the kernel alone, x num_layers calls,
to attribute the step time and pick a decode-optimal page size.

    python benchmarks/micro_decode_attn.py
"""

import faulthandler
import os
import signal
import sys
import time

import numpy as np

faulthandler.register(signal.SIGUSR1, all_threads=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lvt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from light_vllm_tpu.ops.paged_attention_pallas import (  # noqa: E402
    paged_attention_decode)


def run_case(S, kvh, h, d, page_size, ctx, L, dtype, n_timed=10):
    rng = np.random.default_rng(0)
    num_pages_per_seq = -(-ctx // page_size)
    num_pages = S * num_pages_per_seq + 1
    num_slots = num_pages * page_size
    q = jnp.asarray(rng.standard_normal((S, h, d)), jnp.bfloat16)
    # KV generated ON DEVICE: the host-side float64 gaussian for a ~5 GB
    # cache plus its tunnel transfer costs minutes per case. One layer is
    # generated and tiled so the bf16 intermediate never exceeds 1/L of
    # the cache (the full-size bf16 temp OOMed the 2048-ctx case).
    layer0 = (jax.random.normal(jax.random.PRNGKey(0),
                                (1, num_slots, 2 * kvh, d), jnp.bfloat16)
              * 0.25).astype(dtype)
    kv = jax.block_until_ready(jnp.tile(layer0, (L, 1, 1, 1)))
    del layer0
    bt = np.zeros((S, 64), np.int32)
    nxt = 1
    for s in range(S):
        for i in range(num_pages_per_seq):
            bt[s, i] = nxt
            nxt += 1
    bt = jnp.asarray(bt)
    sl = jnp.full((S,), ctx, jnp.int32)
    scale = d ** -0.5

    # REP kernel calls chained INSIDE one executable (each call's q is
    # the previous call's output, so nothing can be elided or
    # overlapped away), timed across the whole dispatch: per-dispatch
    # timing on the remote relay reports async-enqueue time, not device
    # time (observed "0.1 ms" for multi-GB reads).
    REP = max(n_timed, 4)

    @jax.jit
    def step(q, kv, bt, sl):
        def body(i, out):
            for li in range(L):
                out = paged_attention_decode(
                    out, kv, bt, sl, page_size=page_size, scale=scale,
                    layer_idx=jnp.int32(li))
            return out
        out = jax.lax.fori_loop(0, REP, body, q)
        return jnp.sum(out.astype(jnp.float32))

    float(step(q, kv, bt, sl))  # warm (forces full d2h sync)
    t0 = time.perf_counter()
    float(step(q, kv, bt, sl))
    med = (time.perf_counter() - t0) / REP
    kv_bytes = S * ctx * 2 * kvh * d * jnp.dtype(dtype).itemsize * L
    dmas = S * num_pages_per_seq * L
    print(f"S={S} page={page_size:3d} ctx={ctx:4d} L={L} {str(dtype):>18}: "
          f"{med * 1e3:8.2f} ms  ({dmas:6d} DMAs, "
          f"{kv_bytes / med / 1e9:6.1f} GB/s eff, "
          f"{med / dmas * 1e6:5.2f} us/DMA)", flush=True)
    return med


def main():
    S, kvh, h, d, L = 256, 8, 32, 128, 32
    ctx = 272
    for dtype in (jnp.float8_e4m3fn,):
        for page in (16, 32, 64, 128):
            c = max(ctx, page)
            run_case(S, kvh, h, d, page, c, L, dtype)
    # longer context scaling at the chosen page size
    for page in (32, 64):
        for c in (512, 1024, 2048):
            run_case(S, kvh, h, d, page, c, L, jnp.float8_e4m3fn)


if __name__ == "__main__":
    main()
