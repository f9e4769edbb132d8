"""Worker for the 2-process ENGINE test (launched by
test_multiprocess_engine.py). Each process contributes 2 CPU devices and
constructs the REAL LLMEngine over the global 4-device hybrid mesh
(tp=2 inside a process, dp=2 across processes — the DCN axis). Every
process runs the identical host program (scheduler, blob builder,
detokenizer state); dp-sharded step outputs are all-gathered in-step so
each process's output processor reads full rows (SURVEY §7 stage 9
cross-host continuous batching; the reference is single-GPU only)."""

import os
import sys

if "xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2"
                               ).strip()

import torch  # noqa: F401  (torch-before-jax: OpenMP runtime clash)
import jax

jax.config.update("jax_platforms", "cpu")
os.environ["LVT_PLATFORM"] = "cpu"
os.environ["LVT_ATTENTION_BACKEND"] = "reference"

import json  # noqa: E402

import numpy as np  # noqa: E402


def build_and_generate():
    from light_vllm_tpu import LLM, SamplingParams

    cfg = dict(
        architectures=["Qwen2ForCausalLM"],
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=256,
        rms_norm_eps=1e-6, rope_theta=10000.0, hidden_act="silu",
        tie_word_embeddings=False)
    llm = LLM(hf_config=cfg, load_format="dummy", dtype="float32",
              max_model_len=128, block_size=8,
              num_device_blocks_override=64, max_num_seqs=4,
              tensor_parallel_size=2, data_parallel_size=2)
    rng = np.random.default_rng(11)
    prompts = [{"prompt_token_ids": rng.integers(3, 250,
                                                 size=int(n)).tolist()}
               for n in rng.integers(4, 24, size=6)]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(prompts, params)
    return {o.request_id: o.outputs[0].token_ids for o in outs}


def main() -> None:
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    from light_vllm_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    tokens = build_and_generate()
    print("ENGINE TOKENS " + json.dumps(tokens), flush=True)
    print(f"ENGINE worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
