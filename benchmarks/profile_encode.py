"""Attribute encode-leg time: pure device forward vs engine overhead.

The r4 encode leg ran at ~4% MFU; r5 moved the embedding pooling on
device (10.4k -> 57k tok/s). This script publishes the remaining
breakdown at the bench shape (BGE-M3 / XLM-R-large, 64 docs x 512 tok
per batch, 512 docs total):

  - forward_ms:   jitted model forward, kernel-only (block_until_ready
                  loop over the same [64, 512] batch)
  - e2e_ms:       llm.encode of one 64-doc wave through the engine
  - engine_ms:    e2e - forward = scheduler + input build + dispatch +
                  d2h + output processing + relay RTT

    python benchmarks/profile_encode.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("LVT_PRECOMPILE", "greedy")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lvt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_BF16_PEAK = 197e12


def bge_m3_config():
    return dict(
        architectures=["XLMRobertaModel"],
        vocab_size=250002, hidden_size=1024, num_hidden_layers=24,
        num_attention_heads=16, intermediate_size=4096,
        max_position_embeddings=8194, type_vocab_size=1,
        layer_norm_eps=1e-5, hidden_act="gelu", pad_token_id=1)


def matmul_flops_per_token(cfg):
    H, I, L = cfg["hidden_size"], cfg["intermediate_size"], \
        cfg["num_hidden_layers"]
    return 2 * L * (4 * H * H + 2 * H * I)


def main():
    from light_vllm_tpu import LLM

    B, Lseq, total = 64, 512, 512
    cfg = bge_m3_config()
    llm = LLM(hf_config=cfg, load_format="dummy", max_model_len=Lseq,
              max_num_requests=B,
              scheduling=os.environ.get("LVT_BENCH_SCHEDULING", "async"))
    rng = np.random.default_rng(0)
    reqs = [{"prompt_token_ids":
             rng.integers(3, 250000, size=Lseq).tolist()}
            for _ in range(total)]

    # warm all executables
    llm.encode(reqs[:B])

    # --- kernel-only: drive the worker's jitted forward directly -------
    worker = llm.llm_engine.executor.worker
    runner = worker.runner
    ids = jnp.asarray(rng.integers(3, 250000, size=(B, Lseq)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(Lseq, dtype=jnp.int32), (B, Lseq))
    mask = jnp.ones((B, Lseq), jnp.int32)
    tti = jnp.zeros((B, Lseq), jnp.int32)
    sl = jnp.full((B,), Lseq, jnp.int32)
    out = runner._jit_forward(runner.params, ids, pos, mask, tti, sl)
    jax.block_until_ready(out)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = runner._jit_forward(runner.params, ids, pos, mask, tti, sl)
    jax.block_until_ready(out)
    fwd_ms = (time.perf_counter() - t0) / n * 1000

    flops = matmul_flops_per_token(cfg) * B * Lseq
    fwd_mfu = flops / (fwd_ms / 1000) / V5E_BF16_PEAK

    # --- e2e: one full 512-doc run through the engine ------------------
    t0 = time.perf_counter()
    outs = llm.encode(reqs)
    e2e_s = time.perf_counter() - t0
    assert len(outs) == total
    waves = total // B
    e2e_ms = e2e_s / waves * 1000

    tok_s = total * Lseq / e2e_s
    e2e_mfu = flops * waves / e2e_s / V5E_BF16_PEAK
    print(f"forward ({B}x{Lseq}):  {fwd_ms:8.1f} ms  (MFU {fwd_mfu:.3f})")
    print(f"e2e per wave:       {e2e_ms:8.1f} ms  (MFU {e2e_mfu:.3f}, "
          f"{tok_s:.0f} tok/s)")
    print(f"engine overhead:    {e2e_ms - fwd_ms:8.1f} ms/wave "
          f"(sched+build+dispatch+d2h+outproc+relay RTT)")
    llm.shutdown()


if __name__ == "__main__":
    main()
