"""Chunked-prefill throughput on a ShareGPT-like length mix (reference:
benchmarks/benchmark_chunked_prefill_throughput.py — sampled real-prompt
lengths, chunked vs default scheduling).

No network: prompt lengths are drawn from a lognormal fit of ShareGPT
(median ~120 tokens, long tail to ~2k), token ids random.

Usage: python benchmarks/benchmark_chunked_prefill_throughput.py [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lvt_jax_cache"))


def sharegpt_like_lengths(rng, n, max_len=1900):
    lens = np.minimum(
        np.maximum(rng.lognormal(mean=4.8, sigma=0.9, size=n), 8),
        max_len)
    return lens.astype(int)


def run(chunked: bool, num_prompts: int):
    from light_vllm_tpu import LLM
    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    cfg = dict(architectures=["Qwen2ForCausalLM"], vocab_size=151936,
               hidden_size=1536, num_hidden_layers=28,
               num_attention_heads=12, num_key_value_heads=2,
               intermediate_size=8960, max_position_embeddings=4096,
               rms_norm_eps=1e-6, rope_theta=1e6, hidden_act="silu",
               tie_word_embeddings=False)
    llm = LLM(hf_config=cfg, load_format="dummy", dtype="bfloat16",
              max_model_len=2048, block_size=16, max_num_seqs=128,
              enable_chunked_prefill=chunked,
              max_num_batched_tokens=1920 if chunked else 1920,
              scheduling="simple_async", num_scheduler_steps=8,
              swap_space=1.0)
    rng = np.random.default_rng(0)
    lens = sharegpt_like_lengths(rng, num_prompts)
    prompts = [{"prompt_token_ids":
                rng.integers(10, 50000, size=n).tolist()} for n in lens]
    out_len = 64
    params = SamplingParams(temperature=0.0, max_tokens=out_len,
                            ignore_eos=True, detokenize=False)
    llm.generate(prompts[:16], params)  # warmup compile
    t0 = time.perf_counter()
    outs = llm.generate(prompts, params)
    dt = time.perf_counter() - t0
    total = int(lens.sum()) + num_prompts * out_len
    print(f"chunked={chunked}: {num_prompts} reqs "
          f"(in p50 {int(np.median(lens))}, max {int(lens.max())}), "
          f"{dt:.2f}s, {num_prompts / dt:.2f} req/s, "
          f"{total / dt:.0f} tok/s")
    llm.llm_engine.shutdown()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    run(False, n)
    run(True, n)
