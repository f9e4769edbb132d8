"""Encode throughput per attention backend (reference:
benchmarks/benchmark_attention_impl.py — FLASH_ATTN/XFORMERS/SDPA/NAIVE
zoo collapses to reference-jnp vs pallas-flash on TPU).

Usage: python benchmarks/benchmark_attention_impl.py [batch] [seqlen]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(backend: str, batch: int, seq_len: int):
    os.environ["LVT_ATTENTION_BACKEND"] = backend

    from light_vllm_tpu import LLM

    cfg = dict(architectures=["BertModel"], vocab_size=30522,
               hidden_size=768, num_hidden_layers=12,
               num_attention_heads=12, intermediate_size=3072,
               max_position_embeddings=max(seq_len + 2, 512),
               type_vocab_size=2, layer_norm_eps=1e-12,
               hidden_act="gelu", pad_token_id=0)
    llm = LLM(hf_config=cfg, load_format="dummy", dtype="bfloat16",
              max_model_len=seq_len, max_num_requests=batch)
    rng = np.random.default_rng(0)
    prompts = [{"prompt_token_ids":
                rng.integers(10, 30000, size=seq_len).tolist()}
               for _ in range(batch * 8)]
    llm.encode(prompts[:batch])  # warmup compile
    t0 = time.perf_counter()
    outs = llm.encode(prompts)
    dt = time.perf_counter() - t0
    total = len(prompts) * seq_len
    print(f"backend={backend}: {len(prompts)} x {seq_len} tokens in "
          f"{dt:.2f}s -> {total / dt:.0f} tok/s, "
          f"{len(prompts) / dt:.1f} req/s")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seq_len = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    for backend in ("reference", "pallas"):
        run(backend, batch, seq_len)
