"""End-to-end serving benchmark on the local accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": ...}

Primary metric (trend): Qwen2-1.5B bf16, 256in/16out continuous batching —
mirrors the reference's baseline harness shape (reference:
benchmarks/baseline.py). vs_baseline compares against the reference's
only recorded number (vllm 0.6.1, 59.08 req/s ≈ 16.1k total tok/s on
Qwen2-7B FP8, unstated GPU — see BASELINE.md; not hardware-comparable,
recorded for trend only).

North-star config (BASELINE.md "Our north star"): Llama-3-8B-shaped FP8
weights + FP8 KV cache, same workload — reported in "extra" as
llama3_8b_fp8 tok/s/chip + MFU (model FLOPs / chip bf16 peak; TPU v5e has
no native fp8 MXU path, XLA upconverts). Skip with LVT_BENCH_SKIP_8B=1.
"""

import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

# SIGUSR1 dumps all thread stacks to stderr — debugging aid for hung legs
# (the axon device-claim occasionally wedges; see run_leg_isolated).
faulthandler.register(signal.SIGUSR1, all_threads=True)

# The bench workload is all-greedy: precompile only the greedy executable
# variants (LVT_PRECOMPILE=auto would also compile the sampled ones).
os.environ.setdefault("LVT_PRECOMPILE", "greedy")

# Persistent compilation cache: first run pays remote-compile latency once;
# later runs reuse executables.
os.makedirs(os.path.expanduser("~/.cache/lvt_jax_cache"), exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lvt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_BF16_PEAK = 197e12  # TPU v5e (v5 lite) peak bf16 FLOP/s


def qwen2_1_5b_config():
    return dict(
        architectures=["Qwen2ForCausalLM"],
        vocab_size=151936, hidden_size=1536, num_hidden_layers=28,
        num_attention_heads=12, num_key_value_heads=2,
        intermediate_size=8960, max_position_embeddings=4096,
        rms_norm_eps=1e-6, rope_theta=1000000.0, hidden_act="silu",
        tie_word_embeddings=False)


def llama3_8b_config():
    return dict(
        architectures=["LlamaForCausalLM"],
        vocab_size=128256, hidden_size=4096, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8,
        intermediate_size=14336, max_position_embeddings=8192,
        rms_norm_eps=1e-5, rope_theta=500000.0, hidden_act="silu",
        tie_word_embeddings=False)


def matmul_params(cfg):
    """Matmul-visible parameter count (embeddings excluded, lm_head
    included) — the 2*N FLOPs/token convention."""
    H, L, I, V = (cfg["hidden_size"], cfg["num_hidden_layers"],
                  cfg["intermediate_size"], cfg["vocab_size"])
    heads, kvh = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    d = H // heads
    per_layer = (H * d * (heads + 2 * kvh)   # qkv
                 + heads * d * H             # o
                 + 3 * H * I)                # gate/up/down
    return L * per_layer + H * V             # + lm_head


def build_llm(cfg, max_num_seqs, dtype="bfloat16", quantization=None,
              kv_cache_dtype="auto"):
    from light_vllm_tpu import LLM

    # async: the executor thread dispatches + starts output readback while
    # the engine thread builds the next batch — hides the tunnel's ~36ms
    # per-step d2h latency (sync measured 18.5k tok/s vs async 26.3k).
    scheduling = os.environ.get("LVT_BENCH_SCHEDULING", "async")
    chunked = bool(int(os.environ.get("LVT_BENCH_CHUNKED", "0")))
    # Static-shape mode's tile-aware budget packs prefill steps into the
    # 2048-token bucket (chunked mode reserves 128 rows for decodes).
    mnbt = int(os.environ.get("LVT_BENCH_MNBT", "2048"))
    steps = int(os.environ.get("LVT_BENCH_STEPS", "8"))
    otf = os.environ.get("LVT_BENCH_ON_THE_FLY")
    # block_size 32: the decode attention kernel is DMA-issue-bound at
    # page 16 (thousands of 32KB page copies per layer call); doubling the
    # page quarters the descriptor count per fetched byte.
    bs = int(os.environ.get("LVT_BENCH_BLOCK", "32"))
    return LLM(hf_config=cfg, load_format="dummy", dtype=dtype,
               quantization=quantization, kv_cache_dtype=kv_cache_dtype,
               max_model_len=2048, block_size=bs,
               max_num_seqs=max_num_seqs,
               enable_chunked_prefill=chunked,
               scheduling=scheduling,
               max_num_on_the_fly=int(otf) if otf else None,
               max_num_batched_tokens=mnbt,
               num_scheduler_steps=steps,
               swap_space=1.0)


def run_workload(llm, num_prompts, input_len, output_len, tag):
    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    rng = np.random.default_rng(0)
    vocab = llm.llm_engine.engine_config.model_config.get_vocab_size()
    prompts = [{
        "prompt_token_ids": rng.integers(10, vocab - 1000,
                                         size=input_len).tolist()
    } for _ in range(num_prompts)]
    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True, detokenize=False)

    # Drain the background multi-step compiles BEFORE any execution:
    # (a) until they land, decode windows serve through the ~30% slower
    # single-step path (timing that cost r03 5k tok/s), and (b) a compile
    # in flight on the remote-compile relay head-of-line-blocks step
    # readbacks for minutes (observed 5-18 min warmup stalls with the
    # first d2h stuck behind the K=8 multi-step compile).
    t_warm = time.perf_counter()
    n_bg = llm.llm_engine.wait_for_precompile()
    # Warmup: compile the executable set the main run will hit — 39 prompts
    # covers the full 7-prompt prefill steps (T=2048), the 4-prompt tail
    # and the decode buckets (see processor.py ladders).
    warm = llm.generate(prompts[:39], params)
    assert all(len(o.outputs[0].token_ids) == output_len for o in warm)
    warmup_s = time.perf_counter() - t_warm
    sys.stderr.write(f"# [{tag}] warmup {warmup_s:.1f}s"
                     f" (waited for {n_bg} background compiles first)\n")

    engine = llm.llm_engine
    # Two timed repeats with FRESH random prompts (no prefix-cache help):
    # the remote-device relay can wedge a transfer for minutes mid-window,
    # poisoning a 2-3s measurement; steady-state throughput = best repeat
    # (both recorded).
    n_repeats = int(os.environ.get("LVT_BENCH_REPEATS", "2"))
    runs = []
    for rep in range(n_repeats):
        rep_prompts = [{
            "prompt_token_ids": rng.integers(10, vocab - 1000,
                                             size=input_len).tolist()
        } for _ in range(num_prompts)] if rep else prompts
        t0 = time.perf_counter()
        for i, p in enumerate(rep_prompts):
            engine.add_request(f"bench-{rep}-{i}", p, params)
        first_token_ts = {}
        while engine.has_unfinished_requests():
            outs = engine.step()
            now = time.perf_counter()
            for o in outs:
                if o.request_id not in first_token_ts and o.outputs and \
                        o.outputs[0].token_ids:
                    first_token_ts[o.request_id] = now - t0
        elapsed = time.perf_counter() - t0

        total_tokens = num_prompts * (input_len + output_len)
        tok_s = total_tokens / elapsed
        gen_tok_s = num_prompts * output_len / elapsed
        ttfts = sorted(first_token_ts.values())
        p50_ttft = ttfts[len(ttfts) // 2] if ttfts else float("nan")
        sys.stderr.write(
            f"# [{tag}] rep{rep}: {num_prompts} reqs "
            f"{input_len}in/{output_len}out: "
            f"{elapsed:.2f}s, {num_prompts / elapsed:.2f} req/s, "
            f"{tok_s:.0f} total tok/s, {gen_tok_s:.0f} gen tok/s, "
            f"p50 TTFT {p50_ttft:.2f}s\n")
        runs.append(dict(total_tok_s=round(tok_s, 1),
                         gen_tok_s=round(gen_tok_s, 1),
                         p50_ttft_s=round(p50_ttft, 3),
                         req_s=round(num_prompts / elapsed, 2)))
    best = max(runs, key=lambda r: r["total_tok_s"])
    return dict(best, warmup_s=round(warmup_s, 1),
                repeats=[r["total_tok_s"] for r in runs])


def bge_m3_config():
    """BGE-M3 shape = XLM-RoBERTa-large (reference:
    benchmarks/benchmark_bge-m3.py workload)."""
    return dict(
        architectures=["XLMRobertaModel"],
        vocab_size=250002, hidden_size=1024, num_hidden_layers=24,
        num_attention_heads=16, intermediate_size=4096,
        max_position_embeddings=8194, type_vocab_size=1,
        layer_norm_eps=1e-5, hidden_act="gelu", pad_token_id=1)


def run_encode_leg(num_docs=512, seq_len=512):
    """Encode-throughput leg (BASELINE.md north star tracks BGE-m3/XLM-R
    encode throughput; reference: benchmarks/benchmark_bge-m3.py)."""
    from light_vllm_tpu import LLM

    llm = LLM(hf_config=bge_m3_config(), load_format="dummy",
              max_model_len=seq_len, max_num_requests=64,
              scheduling=os.environ.get("LVT_BENCH_SCHEDULING", "async"))
    rng = np.random.default_rng(0)
    reqs = [{"prompt_token_ids":
             rng.integers(3, 250000, size=seq_len).tolist()}
            for _ in range(num_docs)]
    # Warmup must cover the (64, 512) batch bucket the main run hits —
    # an 8-doc warmup leaves the big executable to compile inside rep0
    # (measured: rep0 9.5k vs rep1 57.1k tok/s).
    t_warm = time.perf_counter()
    warm = llm.encode(reqs[:64])
    assert all(o.embedding is not None for o in warm)
    warmup_s = time.perf_counter() - t_warm
    # Two timed repeats, best reported (like the decode legs): the remote
    # relay's per-dispatch latency varies run to run and this leg is
    # dispatch-dense (512 docs / 64-seq batches).
    n_repeats = int(os.environ.get("LVT_BENCH_REPEATS", "2"))
    repeats = []
    for _ in range(max(n_repeats, 1)):
        t0 = time.perf_counter()
        outs = llm.encode(reqs)
        dt = time.perf_counter() - t0
        assert len(outs) == num_docs
        repeats.append(num_docs * seq_len / dt)
        sys.stderr.write(
            f"# [bge-m3-encode] {num_docs} docs x {seq_len} tok: {dt:.2f}s, "
            f"{num_docs / dt:.1f} req/s, {repeats[-1]:.0f} tok/s "
            f"(warmup {warmup_s:.1f}s)\n")
    tok_s = max(repeats)
    llm.shutdown()
    return dict(total_tok_s=round(tok_s, 1),
                req_s=round(tok_s / seq_len, 2),
                warmup_s=round(warmup_s, 1),
                repeats=[round(r, 1) for r in repeats])


def run_arrivals_case(llm, prompts, rate, output_len, tag):
    """Open-loop serving: Poisson arrivals at `rate` req/s injected while
    the engine steps; per-request TTFT/TPOT measured from ARRIVAL time
    (reference workload family:
    benchmarks/benchmark_chunked_prefill_throughput.py — ShareGPT-sampled
    arrivals; the all-requests-at-t0 legs above measure batch throughput,
    not serving latency)."""
    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True, detokenize=False)
    engine = llm.llm_engine
    n = len(prompts)
    rng = np.random.default_rng(7)
    arrive = np.cumsum(rng.exponential(1.0 / rate, size=n))
    sub_t, first_tok, done_t = {}, {}, {}
    sent = 0
    t0 = time.perf_counter()
    while sent < n or engine.has_unfinished_requests():
        now = time.perf_counter() - t0
        while sent < n and arrive[sent] <= now:
            rid = f"arr-{sent}"
            engine.add_request(rid, prompts[sent], params)
            sub_t[rid] = arrive[sent]
            sent += 1
        if not engine.has_unfinished_requests():
            time.sleep(min(max(arrive[sent] - now, 0.0), 0.005))
            continue
        outs = engine.step()
        now = time.perf_counter() - t0
        for o in outs:
            rid = o.request_id
            if rid not in first_tok and o.outputs and \
                    o.outputs[0].token_ids:
                first_tok[rid] = now - sub_t[rid]
            if o.finished:
                done_t[rid] = now
    elapsed = time.perf_counter() - t0
    ttfts = np.sort(np.array(list(first_tok.values())))
    tpots = np.array([
        (done_t[r] - sub_t[r] - first_tok[r]) / max(output_len - 1, 1)
        for r in done_t])
    res = dict(
        rate_req_s=round(rate, 1),
        p50_ttft_s=round(float(np.percentile(ttfts, 50)), 3),
        p99_ttft_s=round(float(np.percentile(ttfts, 99)), 3),
        mean_tpot_ms=round(float(tpots.mean() * 1e3), 1),
        p99_tpot_ms=round(float(np.percentile(tpots, 99) * 1e3), 1),
        total_s=round(elapsed, 2),
        req_s=round(n / elapsed, 2))
    sys.stderr.write(
        f"# [arrivals:{tag}] {n} reqs @ {rate:.0f}/s: p50 TTFT "
        f"{res['p50_ttft_s']}s p99 {res['p99_ttft_s']}s, TPOT "
        f"{res['mean_tpot_ms']}ms (p99 {res['p99_tpot_ms']}ms), "
        f"{res['req_s']} req/s over {res['total_s']}s\n")
    return res


def run_arrivals_leg(num_prompts=256, input_len=256, output_len=16):
    """Serving-latency leg: Poisson arrivals at ~0.8x the measured closed-
    loop max, chunked prefill OFF vs ON, plus a shared-prefix workload
    with prefix caching ON — the first hardware numbers for both policies
    (VERDICT r4 #3)."""
    from light_vllm_tpu import LLM
    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    # ~0.8x the measured closed-loop max (146.8 req/s, r5 qwen2 leg)
    rate = float(os.environ.get("LVT_BENCH_ARRIVAL_RATE", "117"))
    cfg = qwen2_1_5b_config()
    rng = np.random.default_rng(0)
    vocab = cfg["vocab_size"]

    def rand_prompts(n, length):
        return [{"prompt_token_ids": rng.integers(
            10, vocab - 1000, size=length).tolist()} for _ in range(n)]

    results = {}
    for tag, chunked, apc, prompts in (
            ("chunked_off", False, False,
             rand_prompts(num_prompts, input_len)),
            ("chunked_on", True, False,
             rand_prompts(num_prompts, input_len)),
            # shared 192-token prefix + 64 unique: prefix caching skips
            # 75% of prefill compute after the first request.
            ("shared_prefix_apc", False, True, [
                {"prompt_token_ids":
                 SHARED_PREFIX + rng.integers(
                     10, vocab - 1000, size=input_len - 192).tolist()}
                for _ in range(num_prompts)])):
        os.environ["LVT_BENCH_CHUNKED"] = "1" if chunked else "0"
        llm = LLM(hf_config=cfg, load_format="dummy", dtype="bfloat16",
                  max_model_len=2048, block_size=32, max_num_seqs=256,
                  enable_chunked_prefill=chunked,
                  enable_prefix_caching=apc,
                  scheduling=os.environ.get("LVT_BENCH_SCHEDULING",
                                            "async"),
                  max_num_batched_tokens=2048, num_scheduler_steps=8,
                  swap_space=1.0)
        params = SamplingParams(temperature=0.0, max_tokens=output_len,
                                ignore_eos=True, detokenize=False)
        llm.llm_engine.wait_for_precompile()
        warm = llm.generate(rand_prompts(39, input_len), params)
        assert all(len(o.outputs[0].token_ids) == output_len
                   for o in warm)
        results[tag] = run_arrivals_case(llm, prompts, rate, output_len,
                                         tag)
        llm.shutdown()
    return results


SHARED_PREFIX = list(range(100, 292))  # fixed 192-token common prefix


def run_parity_gate():
    """On-device kernel parity gate (compiled Mosaic, not interpret): a
    numerically-wrong kernel must kill the bench rather than ship a great
    number. Returns the per-kernel max-error dict."""
    from light_vllm_tpu.ops.parity import run_kernel_parity

    t0 = time.perf_counter()
    res = run_kernel_parity()
    sys.stderr.write(
        "# kernel parity gate passed (%d kernels, %.1fs): %s\n"
        % (len(res), time.perf_counter() - t0,
           " ".join(f"{k}={v:.1e}" for k, v in res.items())))
    return res


def run_leg(leg, num_prompts):
    """Run ONE bench leg in this process; returns its result dict."""
    if leg == "parity":
        return {k: float(v) for k, v in run_parity_gate().items()}
    if leg == "qwen2":
        # max_num_seqs = the full request count: all 256 sequences decode
        # in one batch (weight reads amortize over the widest batch) and
        # prefill admission never waits on a decode wave — measured
        # 35.6k tok/s vs 34.4k at 128, p50 TTFT 0.73s vs 1.07s.
        llm = build_llm(qwen2_1_5b_config(), max_num_seqs=256)
        r = run_workload(llm, num_prompts, 256, 16, "qwen2-1.5b")
        llm.shutdown()
        return r
    if leg == "encode":
        return run_encode_leg()
    if leg == "arrivals":
        return run_arrivals_leg()
    if leg == "8b":
        cfg8 = llama3_8b_config()
        # 256 concurrent seqs: decode reads the 8 GB weight stack once
        # per step regardless of batch, so the wider batch halves the
        # per-token weight-read cost; 256 x 272-token KV (69.6k slots)
        # still fits the 72.7k-slot cache.
        llm8 = build_llm(cfg8, max_num_seqs=256, quantization="fp8",
                         kv_cache_dtype="fp8")
        r8 = run_workload(llm8, max(num_prompts, 64), 256, 16,
                          "llama3-8b-fp8")
        mfu = r8["total_tok_s"] * 2 * matmul_params(llama3_8b_config()) \
            / V5E_BF16_PEAK
        llm8.shutdown()
        return dict(r8, mfu=round(mfu, 4))
    raise ValueError(f"unknown leg {leg!r}")


_LEG_SENTINEL = "LVT_LEG_RESULT:"
_LEG_TIMEOUT_S = {"parity": 1500, "qwen2": 1500, "encode": 1200,
                  "8b": 2100, "arrivals": 1800}


def run_leg_isolated(leg, num_prompts, retries=2):
    """Run a leg in a fresh subprocess: each leg gets the chip's FULL HBM
    (XLA frees device memory only at client teardown in some backends, and
    a leaked buffer from leg N must never OOM leg N+1 — r03's 8B leg died
    exactly that way). The remote-device relay intermittently stalls
    transfers for minutes; a timed-out or dead leg is retried once on a
    fresh claim. In-process fallback: LVT_BENCH_INPROC=1."""
    import subprocess

    if int(os.environ.get("LVT_BENCH_INPROC", "0")):
        return run_leg(leg, num_prompts)
    timeout = int(os.environ.get("LVT_BENCH_LEG_TIMEOUT",
                                 _LEG_TIMEOUT_S.get(leg, 1800)))
    last_err = None
    for attempt in range(retries + 1):
        if attempt:
            time.sleep(15)  # let the relay settle before a fresh claim
        t0 = time.perf_counter()
        try:
            # stderr inherits (live progress); only stdout (the sentinel
            # line) is captured. Final attempt skips the d2h probe: the
            # probe itself is the thing that wedges in some relay phases
            # (observed 4 consecutive probe wedges while probe-less runs
            # of the same leg succeeded immediately); best-of-two repeats
            # still protect the measurement if the wedge moves in-leg.
            cmd = [sys.executable, os.path.abspath(__file__), "--leg",
                   leg, str(num_prompts)]
            if attempt == retries:
                cmd.append("--no-probe")
            proc = subprocess.run(
                cmd, stdout=subprocess.PIPE, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            last_err = f"leg {leg!r} timed out after {timeout}s"
            sys.stderr.write(f"# {last_err} (attempt {attempt + 1})\n")
            continue
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith(_LEG_SENTINEL):
                out = json.loads(line[len(_LEG_SENTINEL):])
                sys.stderr.write(f"# leg {leg} done in "
                                 f"{time.perf_counter() - t0:.0f}s\n")
                return out
        last_err = (f"leg {leg!r} subprocess exited rc={proc.returncode} "
                    f"without a result line (see stderr above)")
        sys.stderr.write(f"# {last_err} (attempt {attempt + 1})\n")
    raise RuntimeError(last_err)


def main():
    argv = sys.argv[1:]
    leg = None
    if argv[:1] == ["--leg"]:
        leg, argv = argv[1], argv[2:]
    no_probe = "--no-probe" in argv
    argv = [a for a in argv if a != "--no-probe"]
    num_prompts = int(argv[0]) if argv else 256

    if leg is not None:  # child mode: one leg, one sentinel line
        # Establish the d2h transfer stream on a QUIET connection before
        # any heavy h2d/compile traffic: the first device→host fetch of a
        # process intermittently wedges for minutes when issued under
        # load on the remote-device relay (observed repeatedly: parity's
        # first scalar fetch, warmup's first token readback). The wedge
        # can hit the probe itself — a watchdog hard-exits rc=3 so the
        # parent retries on a fresh claim in minutes, not the leg timeout.
        if not no_probe:
            import threading

            t0 = time.perf_counter()
            probe_watchdog = threading.Timer(180.0, lambda: (
                sys.stderr.write("# d2h probe wedged >180s; exiting for "
                                 "parent retry\n"), sys.stderr.flush(),
                os._exit(3)))
            probe_watchdog.daemon = True
            probe_watchdog.start()
            import jax.numpy as jnp  # noqa: PLC0415

            float(jnp.zeros((), jnp.float32))
            jnp.zeros((1 << 20,), jnp.float32).block_until_ready()
            np.asarray(jnp.ones((1 << 18,), jnp.float32)).sum()
            probe_watchdog.cancel()
            sys.stderr.write(f"# d2h stream probe "
                             f"{time.perf_counter() - t0:.1f}s\n")
        else:
            sys.stderr.write("# probe skipped (--no-probe final "
                             "attempt)\n")
        print(_LEG_SENTINEL + json.dumps(run_leg(leg, num_prompts)),
              flush=True)
        return

    # Correctness gate BEFORE any timing: refuse to emit a metric line if
    # any Pallas kernel diverges from its jnp reference on this device.
    # Infra flakes (relay timeouts) must NOT suppress the metric — only a
    # genuine kernel mismatch may.
    if not int(os.environ.get("LVT_BENCH_SKIP_PARITY", "0")):
        try:
            run_leg_isolated("parity", num_prompts)
        except RuntimeError as e:
            # rc=3 == probe-wedge self-exit; "timed out" == parent kill.
            # Both are relay infra flakes, not kernel faults.
            if "timed out" not in str(e) and "rc=3" not in str(e):
                raise  # kernel mismatch (or hard failure): no metric
            sys.stderr.write("# WARNING: parity gate unrunnable on relay "
                             f"({e}); continuing (kernels unverified)\n")

    if not int(os.environ.get("LVT_BENCH_SKIP_QWEN", "0")):
        time.sleep(10)  # relay settle between claims
        try:
            qwen2 = run_leg_isolated("qwen2", num_prompts)
        except (RuntimeError, Exception) as e:  # noqa: BLE001
            # Emit an honest zero + error rather than no metric line at
            # all (a wedged relay must not erase the whole bench record).
            import traceback
            traceback.print_exc()
            qwen2 = {"total_tok_s": 0.0,
                     "error": f"{type(e).__name__}: {e}"}
    else:  # 8B-leg iteration mode: keep the JSON schema intact
        qwen2 = {"total_tok_s": 0.0, "skipped": True}

    extra = {}
    for env_key, name, leg_key in (
            ("LVT_BENCH_SKIP_ENCODE", "bge_m3_encode", "encode"),
            ("LVT_BENCH_SKIP_ARRIVALS", "arrivals", "arrivals"),
            ("LVT_BENCH_SKIP_8B", "llama3_8b_fp8", "8b")):
        if int(os.environ.get(env_key, "0")):
            continue
        try:  # a dead leg must never suppress the primary metric line
            time.sleep(10)  # relay settle between claims
            extra[name] = run_leg_isolated(leg_key, num_prompts)
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            extra[name] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "total_throughput_qwen2_1.5b_bf16_256in_16out",
        "value": qwen2["total_tok_s"],
        "unit": "tok/s/chip",
        "vs_baseline": round(qwen2["total_tok_s"] / 16100.0, 3),
        "extra": dict(qwen2=qwen2, **extra),
    }))


if __name__ == "__main__":
    main()
