"""Throughput sweep over max_num_seqs x scheduling mode (reference:
benchmarks/baseline.py:75-77 — req/s, tok/s, TPOT across
sync/simple_async/async/double_buffer)."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lvt_jax_cache"))


def run_one(scheduling, max_num_seqs, num_prompts, input_len, output_len):
    from light_vllm_tpu import LLM
    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    cfg = dict(architectures=["Qwen2ForCausalLM"], vocab_size=151936,
               hidden_size=1536, num_hidden_layers=28,
               num_attention_heads=12, num_key_value_heads=2,
               intermediate_size=8960, max_position_embeddings=4096,
               rms_norm_eps=1e-6, rope_theta=1000000.0, hidden_act="silu",
               tie_word_embeddings=False)
    llm = LLM(hf_config=cfg, load_format="dummy", dtype="bfloat16",
              max_model_len=2048, block_size=16, max_num_seqs=max_num_seqs,
              scheduling=scheduling, swap_space=1.0)
    rng = np.random.default_rng(0)
    prompts = [{"prompt_token_ids":
                rng.integers(10, 50000, size=input_len).tolist()}
               for _ in range(num_prompts)]
    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True, detokenize=False)
    llm.generate(prompts[:4], params)  # warmup compile
    t0 = time.perf_counter()
    llm.generate(prompts, params)
    elapsed = time.perf_counter() - t0
    llm.llm_engine.shutdown()
    req_s = num_prompts / elapsed
    tok_s = num_prompts * (input_len + output_len) / elapsed
    tpot = elapsed / output_len * 1000
    print(f"scheduling={scheduling:13s} max_num_seqs={max_num_seqs:4d}  "
          f"{req_s:7.2f} req/s  {tok_s:9.0f} tok/s  ~{tpot:6.1f} ms/step-ish",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-prompts", type=int, default=128)
    ap.add_argument("--input-len", type=int, default=256)
    ap.add_argument("--output-len", type=int, default=16)
    ap.add_argument("--scheduling", nargs="+",
                    default=["sync", "simple_async"])
    ap.add_argument("--max-num-seqs", nargs="+", type=int, default=[128])
    args = ap.parse_args()
    for sched in args.scheduling:
        for mns in args.max_num_seqs:
            run_one(sched, mns, args.num_prompts, args.input_len,
                    args.output_len)


if __name__ == "__main__":
    main()
