"""Preemption mode comparison under KV pressure: RECOMPUTE vs SWAP
(reference: benchmarks/test_preemption_mode.py).

A deliberately tight device-block pool forces preemption; compares
end-to-end throughput and preemption counts per mode.

Usage: python benchmarks/benchmark_preemption_mode.py [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(mode: str, num_prompts: int):
    from light_vllm_tpu import LLM
    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    cfg = dict(architectures=["Qwen2ForCausalLM"], vocab_size=151936,
               hidden_size=1536, num_hidden_layers=28,
               num_attention_heads=12, num_key_value_heads=2,
               intermediate_size=8960, max_position_embeddings=4096,
               rms_norm_eps=1e-6, rope_theta=1e6, hidden_act="silu",
               tie_word_embeddings=False)
    in_len, out_len = 256, 64
    # Enough pages for ~28 full sequences while 64 run -> heavy preemption.
    blocks = 28 * ((in_len + out_len) // 16 + 1)
    llm = LLM(hf_config=cfg, load_format="dummy", dtype="bfloat16",
              max_model_len=2048, block_size=16, max_num_seqs=64,
              num_device_blocks_override=blocks, swap_space=4.0,
              preemption_mode=mode)
    rng = np.random.default_rng(0)
    prompts = [{"prompt_token_ids":
                rng.integers(10, 50000, size=in_len).tolist()}
               for _ in range(num_prompts)]
    params = SamplingParams(temperature=0.0, max_tokens=out_len,
                            ignore_eos=True, detokenize=False)
    llm.generate(prompts[:8], params)  # warmup compile
    t0 = time.perf_counter()
    llm.generate(prompts, params)
    dt = time.perf_counter() - t0
    n_preempt = llm.llm_engine.scheduler.num_cumulative_preemption
    total = num_prompts * (in_len + out_len)
    print(f"mode={mode}: {dt:.2f}s, {total / dt:.0f} tok/s, "
          f"{n_preempt} preemptions")
    llm.llm_engine.shutdown()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    run("recompute", n)
    run("swap", n)
