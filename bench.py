"""End-to-end serving benchmark on the local accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload mirrors the reference's baseline harness shape
(reference: benchmarks/baseline.py — fixed-length prompts, continuous
batching, req/s + tok/s + TPOT) on a ~1.5B Qwen2-class config with dummy
weights (no network in this environment). vs_baseline is reported against
the reference's only recorded number (vllm 0.6.1, 59.08 req/s ≈ 16.1k
total tok/s on Qwen2-7B FP8, unstated GPU — see BASELINE.md; not
hardware-comparable, recorded for trend only).
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: first run pays remote-compile latency once;
# later runs reuse executables.
os.makedirs(os.path.expanduser("~/.cache/lvt_jax_cache"), exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lvt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_llm(max_num_seqs: int, enable_chunked_prefill: bool):
    from light_vllm_tpu import LLM

    cfg = dict(
        architectures=["Qwen2ForCausalLM"],
        vocab_size=151936,
        hidden_size=1536,
        num_hidden_layers=28,
        num_attention_heads=12,
        num_key_value_heads=2,
        intermediate_size=8960,
        max_position_embeddings=4096,
        rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        hidden_act="silu",
        tie_word_embeddings=False,
    )
    # Sweep knobs (bench experiments; defaults are the recorded config).
    scheduling = os.environ.get("LVT_BENCH_SCHEDULING", "sync")
    chunked = bool(int(os.environ.get("LVT_BENCH_CHUNKED",
                                      str(int(enable_chunked_prefill)))))
    mnbt = int(os.environ.get("LVT_BENCH_MNBT", "1920"))
    steps = int(os.environ.get("LVT_BENCH_STEPS", "8"))
    return LLM(hf_config=cfg, load_format="dummy", dtype="bfloat16",
               max_model_len=2048, block_size=16,
               max_num_seqs=max_num_seqs,
               enable_chunked_prefill=chunked,
               scheduling=scheduling,
               # 7 x 256-token prompts + a 128-row decode region fill the
               # 2048 token bucket with ~6% padding.
               max_num_batched_tokens=mnbt,
               num_scheduler_steps=steps,
               swap_space=1.0)


def main():
    input_len = 256
    output_len = 16
    num_prompts = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    max_num_seqs = 128

    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    llm = build_llm(max_num_seqs, enable_chunked_prefill=False)
    rng = np.random.default_rng(0)
    prompts = [{
        "prompt_token_ids": rng.integers(10, 50000,
                                         size=input_len).tolist()
    } for _ in range(num_prompts)]
    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True, detokenize=False)

    # Warmup: compile the executable set the main run will hit — 39 prompts
    # covers the full 7-prompt prefill steps (T=2048), the 4-prompt tail
    # (T=1024) and the 128-row decode bucket (see processor.py ladders).
    t_warm = time.perf_counter()
    warm = llm.generate(prompts[:39], params)
    assert all(len(o.outputs[0].token_ids) == output_len for o in warm)
    sys.stderr.write(f"# warmup {time.perf_counter() - t_warm:.1f}s\n")

    engine = llm.llm_engine
    t0 = time.perf_counter()
    for i, p in enumerate(prompts):
        engine.add_request(f"bench-{i}", p, params)
    first_token_ts = {}
    done = 0
    steps = 0
    while engine.has_unfinished_requests():
        outs = engine.step()
        steps += 1
        now = time.perf_counter()
        if steps % 25 == 0:
            sys.stderr.write(f"# step {steps}: {done}/{num_prompts} done, "
                             f"{now - t0:.1f}s\n")
        for o in outs:
            if o.request_id not in first_token_ts and o.outputs and \
                    o.outputs[0].token_ids:
                first_token_ts[o.request_id] = now - t0
            if o.finished:
                done += 1
    elapsed = time.perf_counter() - t0

    total_tokens = num_prompts * (input_len + output_len)
    gen_tokens = num_prompts * output_len
    req_s = num_prompts / elapsed
    tok_s = total_tokens / elapsed
    gen_tok_s = gen_tokens / elapsed
    ttfts = sorted(first_token_ts.values())
    p50_ttft = ttfts[len(ttfts) // 2] if ttfts else float("nan")

    sys.stderr.write(
        f"# {num_prompts} reqs {input_len}in/{output_len}out: "
        f"{elapsed:.2f}s, {req_s:.2f} req/s, {tok_s:.0f} total tok/s, "
        f"{gen_tok_s:.0f} gen tok/s, p50 TTFT {p50_ttft:.2f}s\n")

    print(json.dumps({
        "metric": "total_throughput_qwen2_1.5b_bf16_256in_16out",
        "value": round(tok_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(tok_s / 16100.0, 3),
    }))


if __name__ == "__main__":
    main()
