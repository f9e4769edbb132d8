"""Offline text generation (reference: examples/ offline inference pattern).

With a HF checkpoint:
    python examples/offline_inference.py --model Qwen/Qwen2-0.5B-Instruct

Offline (no network): omit --model to run a small random-weight Qwen2-class
model on token-id prompts.
"""

import argparse

import os
import sys

# Runnable as `python examples/<name>.py` without installing:
# the package lives in the repo root (PYTHONPATH is avoided —
# it breaks the axon TPU plugin registration on some hosts).
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


# Honor LVT_PLATFORM=cpu even on hosts whose sitecustomize force-selects
# a TPU jax backend (env JAX_PLATFORMS alone is overridden there); must
# run after importing jax, before any backend touch.
if os.environ.get("LVT_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


from light_vllm_tpu import LLM, SamplingParams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--quantization", default=None)
    ap.add_argument("--dtype", default=None,
                    help="defaults to bfloat16 on TPU, float32 elsewhere "
                         "(CPU has no fast bf16 path)")
    args = ap.parse_args()
    if args.dtype is None:
        from light_vllm_tpu.platforms import current_platform
        args.dtype = "bfloat16" if current_platform().is_tpu \
            else "float32"

    sampling = SamplingParams(temperature=args.temperature,
                              max_tokens=args.max_tokens)

    if args.model:
        llm = LLM(model=args.model, quantization=args.quantization,
                  dtype=args.dtype)
        prompts = [
            "Hello, my name is",
            "The capital of France is",
            "The future of AI is",
        ]
    else:
        cfg = dict(architectures=["Qwen2ForCausalLM"], vocab_size=1024,
                   hidden_size=256, num_hidden_layers=4,
                   num_attention_heads=4, num_key_value_heads=2,
                   intermediate_size=512, max_position_embeddings=512,
                   rms_norm_eps=1e-6, rope_theta=10000.0, hidden_act="silu",
                   tie_word_embeddings=False)
        llm = LLM(hf_config=cfg, load_format="dummy",
                  quantization=args.quantization, max_model_len=256,
                  dtype=args.dtype)
        prompts = [{"prompt_token_ids": list(range(5, 25))},
                   {"prompt_token_ids": list(range(100, 140))}]
        sampling.detokenize = False

    for out in llm.generate(prompts, sampling):
        text = out.outputs[0].text or out.outputs[0].token_ids
        print(f"[{out.request_id}] {text!r}")


if __name__ == "__main__":
    main()
