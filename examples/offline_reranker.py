"""Offline cross-encoder reranking (reference: reranker workflow examples).

    python examples/offline_reranker.py --model BAAI/bge-reranker-v2-m3
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


from light_vllm_tpu import LLM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    args = ap.parse_args()

    llm = LLM(model=args.model)
    pairs = [
        ("what is panda?", "The giant panda is a bear species endemic "
         "to China."),
        ("what is panda?", "Paris is the capital city of France."),
    ]
    for out in llm.reranker(pairs):
        print(f"[{out.request_id}] score={out.score:.4f}")


if __name__ == "__main__":
    main()
