"""KV-block swap bandwidth: device↔host transfer rate for the paged cache
(reference: benchmarks/benchmark_swap_blocks.py).

Usage: python benchmarks/benchmark_swap_blocks.py [num_blocks]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_swap = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    from light_vllm_tpu import LLM

    cfg = dict(architectures=["Qwen2ForCausalLM"], vocab_size=151936,
               hidden_size=1536, num_hidden_layers=28,
               num_attention_heads=12, num_key_value_heads=2,
               intermediate_size=8960, max_position_embeddings=4096,
               rms_norm_eps=1e-6, rope_theta=1e6, hidden_act="silu",
               tie_word_embeddings=False)
    llm = LLM(hf_config=cfg, load_format="dummy", dtype="bfloat16",
              max_model_len=2048, block_size=16, max_num_seqs=64,
              swap_space=4.0)
    worker = llm.llm_engine.executor.worker
    ce = worker.cache_engine
    cc = llm.llm_engine.engine_config.cache_config
    n_swap = min(n_swap, cc.num_device_blocks - 1,
                 cc.num_cpu_blocks or n_swap)
    mapping = [(i + 1, i) for i in range(n_swap)]
    block_bytes = ce.get_cache_block_size(
        cc.block_size,
        llm.llm_engine.engine_config.model_config.get_num_layers(),
        llm.llm_engine.engine_config.model_config.get_num_kv_heads(),
        llm.llm_engine.engine_config.model_config.get_head_size(),
        llm.llm_engine.engine_config.model_config.dtype)
    total = n_swap * block_bytes

    import jax

    # swap_out is async: measure (a) dispatch cost on the engine thread —
    # the piece that sits on the step critical path — and (b) full drain
    # (device gather + d2h readback + host write) for bandwidth.
    ce.swap_out(mapping[:2]); ce.drain_swaps()  # warmup
    t0 = time.perf_counter()
    ce.swap_out(mapping)
    dispatch_ms = (time.perf_counter() - t0) * 1e3
    ce.drain_swaps()
    dt = time.perf_counter() - t0
    print(f"swap_out (d2h): dispatch {dispatch_ms:.2f} ms (critical "
          f"path), drained {n_swap} blocks ({total / 2**20:.0f} MiB) in "
          f"{dt * 1e3:.1f} ms -> {total / dt / 2**30:.2f} GiB/s")

    ce.swap_in(mapping[:2])  # warmup
    t0 = time.perf_counter()
    ce.swap_in(mapping)
    jax.block_until_ready(ce.kv_caches)
    dt = time.perf_counter() - t0
    print(f"swap_in (h2d): {n_swap} blocks ({total / 2**20:.0f} MiB) in "
          f"{dt * 1e3:.1f} ms -> {total / dt / 2**30:.2f} GiB/s")


if __name__ == "__main__":
    main()
