"""Offline embedding / retrieval (reference: examples with BGE-M3).

    python examples/offline_embedding.py --model BAAI/bge-m3
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


import numpy as np

from light_vllm_tpu import LLM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    args = ap.parse_args()

    if args.model:
        llm = LLM(model=args.model)
        sentences = ["What is BGE M3?",
                     "BGE M3 is a multi-functional embedding model."]
        outs = llm.encode(sentences)
    else:
        cfg = dict(architectures=["BGEM3Model"], vocab_size=512,
                   hidden_size=64, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=128,
                   max_position_embeddings=128, type_vocab_size=2,
                   layer_norm_eps=1e-12, hidden_act="gelu", pad_token_id=1)
        llm = LLM(hf_config=cfg, load_format="dummy", max_model_len=64)
        outs = llm.encode([{"prompt_token_ids": [3, 5, 7, 9]},
                           {"prompt_token_ids": [4, 6, 8]}])

    vecs = [np.asarray(o.embedding) for o in outs]
    print("embedding shapes:", [v.shape for v in vecs])
    if len(vecs) == 2 and vecs[0].ndim == 1:
        print("cosine similarity:", float(vecs[0] @ vecs[1]))


if __name__ == "__main__":
    main()
