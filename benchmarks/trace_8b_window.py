"""Capture a device trace of the 8B K=8 decode window and print the top
ops by total duration (jax.profiler.ProfileData — no tensorboard needed).

Investigates the measured in-chain attention inflation (72.7 ms/iter vs
29.9 standalone, profile_8b LVT_PROFILE_MS_ABLATE).

    python benchmarks/trace_8b_window.py
"""

import glob
import os
import sys
from collections import defaultdict

import numpy as np

os.environ.setdefault("LVT_PRECOMPILE", "greedy")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lvt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_llm, llama3_8b_config  # noqa: E402


def main():
    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    cfg = llama3_8b_config()
    llm = build_llm(cfg, max_num_seqs=256, quantization="fp8",
                    kv_cache_dtype="fp8")
    engine = llm.llm_engine
    runner = engine.executor.worker.runner
    engine.wait_for_precompile()

    records = []
    orig_execute = runner.execute

    def recording_execute(mi, kv):
        if mi.multi_step > 1 and mi.num_prefill_seqs == 0:
            records.append((mi, np.asarray(mi.blob).copy()))
        return orig_execute(mi, kv)

    runner.execute = recording_execute
    rng = np.random.default_rng(0)
    vocab = engine.engine_config.model_config.get_vocab_size()
    prompts = [{"prompt_token_ids":
                rng.integers(10, vocab - 1000, size=256).tolist()}
               for _ in range(64)]
    llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=16,
                                         ignore_eos=True,
                                         detokenize=False))
    runner.execute = orig_execute
    mi, blob_np = max(records, key=lambda r: r[0].S)
    K = mi.multi_step
    mkey = ("ms", mi.use_topkp, mi.S, mi.P, K, mi.NT, mi.max_out,
            mi.all_greedy)
    fn = runner._step_cache[mkey]
    kv = engine.executor.worker.cache_engine.kv_caches
    blob = jnp.asarray(blob_np)

    # warm
    ring, kv = fn(runner.params, kv, blob)
    jax.block_until_ready(kv)

    tdir = "/tmp/lvt_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(2):
            ring, kv = fn(runner.params, kv, blob)
        jax.block_until_ready(kv)

    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("trace files:", files)
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read())
    for plane in pd.planes:
        total = defaultdict(float)
        count = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                total[ev.name] += ev.duration_ns
                count[ev.name] += 1
        if not total:
            continue
        print(f"\n=== plane: {plane.name} ===")
        for name, ns in sorted(total.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{ns / 1e6 / 2:9.2f} ms/window x{count[name] // 2:5d}  "
                  f"{name[:110]}")


if __name__ == "__main__":
    main()
