"""Embedding throughput across batch sizes and scheduling modes
(reference: benchmarks/benchmark_bge-m3.py / benchmark_xlm-roberta.py)."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="HF id (e.g. BAAI/bge-m3)")
    ap.add_argument("--num-requests", type=int, default=256)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--scheduling", nargs="+", default=["sync", "async"])
    ap.add_argument("--max-num-requests", nargs="+", type=int,
                    default=[8, 32, 64])
    args = ap.parse_args()

    from light_vllm_tpu import LLM

    rng = np.random.default_rng(0)

    for sched in args.scheduling:
        for bs in args.max_num_requests:
            if args.model:
                llm = LLM(model=args.model, max_num_requests=bs,
                          scheduling=sched)
            else:
                cfg = dict(architectures=["XLMRobertaModel"],
                           vocab_size=32000, hidden_size=1024,
                           num_hidden_layers=24, num_attention_heads=16,
                           intermediate_size=4096,
                           max_position_embeddings=8192, type_vocab_size=1,
                           layer_norm_eps=1e-5, hidden_act="gelu",
                           pad_token_id=1)
                llm = LLM(hf_config=cfg, load_format="dummy",
                          max_model_len=512, max_num_requests=bs,
                          scheduling=sched)
            reqs = [{"prompt_token_ids":
                     rng.integers(3, 30000, size=args.seq_len).tolist()}
                    for _ in range(args.num_requests)]
            llm.encode(reqs[:4])  # warmup
            t0 = time.perf_counter()
            llm.encode(reqs)
            dt = time.perf_counter() - t0
            print(f"scheduling={sched:6s} batch={bs:4d}  "
                  f"{args.num_requests / dt:8.2f} req/s  "
                  f"{args.num_requests * args.seq_len / dt:10.0f} tok/s",
                  flush=True)
            llm.llm_engine.shutdown()


if __name__ == "__main__":
    main()
