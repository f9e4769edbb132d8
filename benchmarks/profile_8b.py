"""Step-time breakdown for the Llama-3-8B FP8 bench leg (VERDICT r3 #2:
"publish the step-time breakdown ... and attack the top item").

Times the ACTUAL compiled step executables on real blobs captured from a
live workload, plus truncated variants (forward-only, forward+logits) that
XLA dead-code-eliminates at trace time, isolating:

    prefill:  forward | +logits | +sampler (= full step)
    decode :  K-step multi-step window | single decode step phases

and reports per-phase MFU / HBM-roofline fractions. Usage:

    python benchmarks/profile_8b.py            # 8B fp8 (bench north star)
    LVT_PROFILE_MODEL=qwen2 python benchmarks/profile_8b.py
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("LVT_PRECOMPILE", "greedy")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lvt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import (V5E_BF16_PEAK, build_llm, llama3_8b_config,  # noqa: E402
                   matmul_params, qwen2_1_5b_config)

V5E_HBM_BW = 819e9  # bytes/s


def _time_fn(fn, args, kv_index, n_warm=2, n_timed=8):
    """Median wall time of fn(*args); the donated kv (2nd arg) is threaded
    through iterations via out[kv_index]. Returns (median_s, last_kv)."""
    params, kv, blob = args
    for _ in range(n_warm):
        out = fn(params, kv, blob)
        kv = out[kv_index]
        jax.block_until_ready(kv)
    times = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        out = fn(params, kv, blob)
        kv = out[kv_index]
        jax.block_until_ready(kv)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), kv


def _time_fn_pipelined(fn, args, kv_index, depth=4, n_timed=4):
    """Per-call DEVICE time with dispatch latency overlapped: time `depth`
    back-to-back calls (kv threaded, sync once) vs one call; the slope is
    pure device compute, the intercept the per-dispatch round trip — the
    remote-relay tunnel adds tens of ms per synchronized dispatch, which
    per-call timing (_time_fn) cannot separate from compute.
    Returns (per_call_s, dispatch_s, kv)."""
    params, kv, blob = args

    def run(n):
        nonlocal kv
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(params, kv, blob)
            kv = out[kv_index]
        jax.block_until_ready(kv)
        return time.perf_counter() - t0

    run(1)  # warm
    t1 = min(run(1) for _ in range(n_timed))
    td = min(run(depth) for _ in range(n_timed))
    per_call = (td - t1) / (depth - 1)
    return per_call, max(t1 - per_call, 0.0), kv


def main():
    which = os.environ.get("LVT_PROFILE_MODEL", "8b")
    if which == "8b":
        cfg = llama3_8b_config()
        llm = build_llm(cfg, max_num_seqs=256, quantization="fp8",
                        kv_cache_dtype="fp8")
        param_bytes = matmul_params(cfg) * 1  # fp8: 1 byte/param
    else:
        cfg = qwen2_1_5b_config()
        llm = build_llm(cfg, max_num_seqs=128)
        param_bytes = matmul_params(cfg) * 2  # bf16

    from light_vllm_tpu.decoding.sampling_params import SamplingParams

    engine = llm.llm_engine
    worker = engine.executor.worker
    runner = worker.runner
    engine.wait_for_precompile()

    # --- capture real model inputs from a live workload -------------------
    records = []
    orig_execute = runner.execute

    def recording_execute(mi, kv):
        records.append(dict(
            multi_step=mi.multi_step, T=mi.T, S=mi.S, NT=mi.NT, P=mi.P,
            num_prefill_seqs=mi.num_prefill_seqs,
            decode_region=mi.decode_region, max_out=mi.max_out,
            use_penalties=mi.use_penalties, use_topkp=mi.use_topkp,
            num_logprobs=mi.num_logprobs,
            has_prompt_tokens=mi.has_prompt_tokens,
            prompt_len=mi.prompt_len, ban_len=mi.ban_len,
            all_greedy=mi.all_greedy, has_plp=mi.has_plp, plp_k=mi.plp_k,
            lp_width=mi.lp_width,
            blob=np.asarray(mi.blob).copy()))
        return orig_execute(mi, kv)

    runner.execute = recording_execute
    rng = np.random.default_rng(0)
    vocab = engine.engine_config.model_config.get_vocab_size()
    prompts = [{"prompt_token_ids":
                rng.integers(10, vocab - 1000, size=256).tolist()}
               for _ in range(64)]
    params_sp = SamplingParams(temperature=0.0, max_tokens=16,
                               ignore_eos=True, detokenize=False)
    llm.generate(prompts, params_sp)
    runner.execute = orig_execute

    prefills = [r for r in records if r["num_prefill_seqs"] > 0]
    ms_windows = [r for r in records
                  if r["multi_step"] > 1 and r["num_prefill_seqs"] == 0
                  and r["T"] == r["S"]]
    if not prefills:
        raise SystemExit("no prefill steps captured")
    pre = max(prefills, key=lambda r: r["T"])
    key = (pre["use_penalties"], pre["use_topkp"], pre["num_logprobs"],
           pre["has_prompt_tokens"], pre["decode_region"],
           min(pre["num_prefill_seqs"], 1), pre["T"], pre["S"], pre["NT"],
           pre["P"], pre["max_out"], pre["prompt_len"], pre["ban_len"],
           pre["all_greedy"], pre["has_plp"], pre["plp_k"],
           pre["lp_width"])

    kv = worker.cache_engine.kv_caches
    blob = jnp.asarray(pre["blob"])
    mp = matmul_params(cfg)
    results = {}

    # --- prefill phases ---------------------------------------------------
    full_fn = runner._step_cache.get(key) or runner._make_step_fn(*key)
    t_full, kv = _time_fn(full_fn, (runner.params, kv, blob), kv_index=3)
    fwd_fn = runner._make_step_fn(*key, profile_phase="fwd")
    t_fwd, kv = _time_fn(fwd_fn, (runner.params, kv, blob), kv_index=1)
    lg_fn = runner._make_step_fn(*key, profile_phase="logits")
    t_lg, kv = _time_fn(lg_fn, (runner.params, kv, blob), kv_index=1)

    T = pre["T"]
    flops_fwd = 2 * (mp - cfg["hidden_size"] * cfg["vocab_size"]) * T
    flops_lm = 2 * cfg["hidden_size"] * cfg["vocab_size"] * pre["S"]
    results["prefill"] = dict(
        T=T, S=pre["S"],
        full_ms=round(t_full * 1e3, 2),
        fwd_ms=round(t_fwd * 1e3, 2),
        logits_ms=round((t_lg - t_fwd) * 1e3, 2),
        sampler_ms=round((t_full - t_lg) * 1e3, 2),
        fwd_mfu=round(flops_fwd / t_fwd / V5E_BF16_PEAK, 3),
        logits_mfu=round(flops_lm / max(t_lg - t_fwd, 1e-9)
                         / V5E_BF16_PEAK, 3),
        tok_s_step=round(T / t_full, 1))

    # (LVT_PROFILE_ABLATE=1) prefill ablation: attribute the prefill
    # fwd's non-matmul tail (attention / kv write / norms+rope glue) —
    # the 0.68-MFU gap has never been decomposed (VERDICT r4).
    if int(os.environ.get("LVT_PROFILE_ABLATE", "0")):
        import light_vllm_tpu.decoding.attention as attn_mod

        t_fwd_dev, _, kv = _time_fn_pipelined(
            fwd_fn, (runner.params, kv, blob), kv_index=1)
        orig_call = attn_mod.Attention.__call__

        def p_write_only(self, q, k, v, kv_cache, meta, layer_idx=None,
                         scales=None):
            Tq = q.shape[0]
            kh = k.reshape(Tq, self.num_kv_heads, self.head_dim)
            vh = v.reshape(Tq, self.num_kv_heads, self.head_dim)
            k_s = v_s = None
            if scales is not None:
                k_s = scales["k_scale"].astype(jnp.float32)
                v_s = scales["v_scale"].astype(jnp.float32)
            kv_cache = self.backend.write_kv(kv_cache, kh, vh, meta,
                                             layer_idx=layer_idx,
                                             k_scale=k_s, v_scale=v_s)
            return q, kv_cache

        def p_identity(self, q, k, v, kv_cache, meta, layer_idx=None,
                       scales=None):
            return q, kv_cache

        try:
            attn_mod.Attention.__call__ = p_write_only
            pf_wo = runner._make_step_fn(*key, profile_phase="fwd")
            tp_wo, _, kv = _time_fn_pipelined(
                pf_wo, (runner.params, kv, blob), kv_index=1)
            attn_mod.Attention.__call__ = p_identity
            pf_id = runner._make_step_fn(*key, profile_phase="fwd")
            tp_id, _, kv = _time_fn_pipelined(
                pf_id, (runner.params, kv, blob), kv_index=1)
        finally:
            attn_mod.Attention.__call__ = orig_call
        results["prefill_ablation"] = dict(
            fwd_full_ms=round(t_fwd_dev * 1e3, 2),
            fwd_write_only_ms=round(tp_wo * 1e3, 2),
            fwd_no_attn_ms=round(tp_id * 1e3, 2),
            attn_read_ms=round((t_fwd_dev - tp_wo) * 1e3, 2),
            kv_write_ms=round((tp_wo - tp_id) * 1e3, 2),
            matmuls_plus_glue_ms=round(tp_id * 1e3, 2))

    # --- single decode step phases ---------------------------------------
    dec_singles = [r for r in records
                   if r["num_prefill_seqs"] == 0 and r["multi_step"] <= 1]
    dec_src = dec_singles or ms_windows
    if dec_src:
        ds = max(dec_src, key=lambda r: r["S"])
        dkey = (ds["use_penalties"], ds["use_topkp"], ds["num_logprobs"],
                ds["has_prompt_tokens"], ds["decode_region"] or ds["S"],
                0, ds["T"], ds["S"],
                ds["NT"], ds["P"], ds["max_out"], ds["prompt_len"],
                ds["ban_len"], ds["all_greedy"], ds["has_plp"],
                ds["plp_k"], ds["lp_width"])
        # (LVT_PROFILE_CONTIG_BT=1) rewrite the recorded block tables to
        # ideal ascending per-seq page runs (timing-only A/B: the kernel
        # reads the wrong pages but does identical work) — isolates what
        # the decode kernel's coalesced-DMA fast path is worth when the
        # allocator delivers perfect contiguity.
        if int(os.environ.get("LVT_PROFILE_CONTIG_BT", "0")):
            S_, P_, NT_ = ds["S"], ds["P"], ds["NT"]
            off_bt = 4 * S_ + 8 * S_ + 6 * S_ + 2 * NT_
            blob_np = ds["blob"].copy()
            sl_np = blob_np[4 * S_:4 * S_ + S_]  # seq_i32[0] = seq_lens
            bs = engine.engine_config.cache_config.block_size
            bt = np.zeros((S_, P_), np.int32)
            nxt = 1
            for s in range(S_):
                n = max(-(-int(sl_np[s]) // bs), 0)
                bt[s, :n] = np.arange(nxt, nxt + n)
                nxt += n
            blob_np[off_bt:off_bt + S_ * P_] = bt.reshape(-1)
            ds["blob"] = blob_np
        dsblob = jnp.asarray(ds["blob"])
        dfull = runner._step_cache.get(dkey) or runner._make_step_fn(*dkey)
        td_full, kv = _time_fn(dfull, (runner.params, kv, dsblob),
                               kv_index=3)
        dfwd = runner._make_step_fn(*dkey, profile_phase="fwd")
        td_fwd, kv = _time_fn(dfwd, (runner.params, kv, dsblob),
                              kv_index=1)
        td_fwd_dev, td_disp, kv = _time_fn_pipelined(
            dfwd, (runner.params, kv, dsblob), kv_index=1)
        dlg = runner._make_step_fn(*dkey, profile_phase="logits")
        td_lg, kv = _time_fn(dlg, (runner.params, kv, dsblob), kv_index=1)
        results["decode_single"] = dict(
            S=ds["S"],
            fwd_dev_ms=round(td_fwd_dev * 1e3, 2),
            dispatch_ms=round(td_disp * 1e3, 2),
            full_ms=round(td_full * 1e3, 3),
            fwd_ms=round(td_fwd * 1e3, 3),
            logits_ms=round((td_lg - td_fwd) * 1e3, 3),
            sampler_ms=round((td_full - td_lg) * 1e3, 3),
            gen_tok_s=round(ds["S"] / td_full, 1))

    # --- ablation: isolate attention-read and kv-write inside the step ---
    # (LVT_PROFILE_ABLATE=1) Monkeypatch Attention.__call__ with (a) a
    # write-only stub (kv write happens, attention read skipped) and (b) a
    # full identity stub, then rebuild the fwd-phase executable: the
    # deltas attribute the decode forward between matmuls+norms, kv write,
    # and the attention read.
    if dec_src and int(os.environ.get("LVT_PROFILE_ABLATE", "0")):
        import light_vllm_tpu.decoding.attention as attn_mod

        orig_call = attn_mod.Attention.__call__

        def write_only(self, q, k, v, kv_cache, meta, layer_idx=None,
                       scales=None):
            T = q.shape[0]
            kh = k.reshape(T, self.num_kv_heads, self.head_dim)
            vh = v.reshape(T, self.num_kv_heads, self.head_dim)
            k_s = v_s = None
            if scales is not None:
                k_s = scales["k_scale"].astype(jnp.float32)
                v_s = scales["v_scale"].astype(jnp.float32)
            kv_cache = self.backend.write_kv(kv_cache, kh, vh, meta,
                                             layer_idx=layer_idx,
                                             k_scale=k_s, v_scale=v_s)
            return q, kv_cache

        def identity(self, q, k, v, kv_cache, meta, layer_idx=None,
                     scales=None):
            return q, kv_cache

        try:
            attn_mod.Attention.__call__ = write_only
            f_wo = runner._make_step_fn(*dkey, profile_phase="fwd")
            t_wo, _, kv = _time_fn_pipelined(
                f_wo, (runner.params, kv, dsblob), kv_index=1)
            attn_mod.Attention.__call__ = identity
            f_id = runner._make_step_fn(*dkey, profile_phase="fwd")
            t_id, _, kv = _time_fn_pipelined(
                f_id, (runner.params, kv, dsblob), kv_index=1)
            # (c) additionally zero out the stacked matmuls: what remains
            # is pure per-layer glue (norms, rope, residuals, reshapes,
            # scan machinery).
            import light_vllm_tpu.ops.stacked_matmul_pallas as smp

            orig_q = smp.stacked_quantized_matmul
            orig_qg = smp.stacked_quantized_matmul_gated
            orig_m = smp.stacked_matmul

            def zq(x, w, s, li, **kw):
                return jnp.zeros((x.shape[0], w.shape[2]), x.dtype)

            def zqg(x, w, s, li, act="silu", **kw):
                return jnp.zeros((x.shape[0], w.shape[2] // 2), x.dtype)

            def zm(x, w, li, **kw):
                return jnp.zeros((x.shape[0], w.shape[2]), x.dtype)

            smp.stacked_quantized_matmul = zq
            smp.stacked_quantized_matmul_gated = zqg
            smp.stacked_matmul = zm
            try:
                f_glue = runner._make_step_fn(*dkey, profile_phase="fwd")
                t_glue, _, kv = _time_fn_pipelined(
                    f_glue, (runner.params, kv, dsblob), kv_index=1)
            finally:
                smp.stacked_quantized_matmul = orig_q
                smp.stacked_quantized_matmul_gated = orig_qg
                smp.stacked_matmul = orig_m
        finally:
            attn_mod.Attention.__call__ = orig_call
        # all device-time (pipelined): dispatch RTT excluded everywhere
        results["decode_ablation"] = dict(
            fwd_full_ms=round(td_fwd_dev * 1e3, 2),
            fwd_write_only_ms=round(t_wo * 1e3, 2),
            fwd_no_attn_ms=round(t_id * 1e3, 2),
            attn_read_ms=round((td_fwd_dev - t_wo) * 1e3, 2),
            kv_write_ms=round((t_wo - t_id) * 1e3, 2),
            glue_only_ms=round(t_glue * 1e3, 2),
            matmuls_ms=round((t_id - t_glue) * 1e3, 2))

    # --- decode window ----------------------------------------------------
    if ms_windows:
        d = max(ms_windows, key=lambda r: r["S"])
        K = d["multi_step"]
        mkey = ("ms", d["use_topkp"], d["S"], d["P"], K, d["NT"],
                d["max_out"], d["all_greedy"])
        ms_fn = runner._step_cache.get(mkey)
        if ms_fn is not None:
            dblob = jnp.asarray(d["blob"])
            t_ms, kv = _time_fn(ms_fn, (runner.params, kv, dblob), kv_index=1)
            t_ms_dev, t_disp, kv = _time_fn_pipelined(
                ms_fn, (runner.params, kv, dblob), kv_index=1)
            S = d["S"]
            # per-step weight-read roofline: the whole stack once per step
            t_w = param_bytes / V5E_HBM_BW
            results["decode"] = dict(
                K=K, S=S, window_ms=round(t_ms * 1e3, 2),
                window_dev_ms=round(t_ms_dev * 1e3, 2),
                dispatch_ms=round(t_disp * 1e3, 2),
                step_ms=round(t_ms / K * 1e3, 3),
                step_dev_ms=round(t_ms_dev / K * 1e3, 3),
                gen_tok_s=round(K * S / t_ms, 1),
                weight_read_roofline_ms=round(t_w * 1e3, 3),
                roofline_frac=round(t_w / (t_ms / K), 3),
                mfu=round(2 * mp * S * K / t_ms / V5E_BF16_PEAK, 3))

            # (LVT_PROFILE_MS_SWEEP=1) window time vs K: the slope is the
            # true marginal per-iteration cost, the intercept the fixed
            # per-window overhead — separates "multi-step machinery is
            # slow per window" from "each chained iteration is slower
            # than a single step".
            if int(os.environ.get("LVT_PROFILE_MS_SWEEP", "0")):
                sweep = {}
                for k2 in (2, 4):
                    fn2 = runner._make_multistep_fn(
                        d["use_topkp"], d["S"], d["P"], k2,
                        runner.page_size, d["NT"],
                        d["max_out"], d["all_greedy"])
                    t2, _, kv = _time_fn_pipelined(
                        fn2, (runner.params, kv, dblob), kv_index=1)
                    sweep[k2] = round(t2 * 1e3, 2)
                sweep[K] = round(t_ms_dev * 1e3, 2)
                ks = sorted(sweep)
                slope = (sweep[ks[-1]] - sweep[ks[0]]) / (ks[-1] - ks[0])
                results["decode"]["ms_sweep"] = dict(
                    window_dev_ms_by_k=sweep,
                    per_iter_ms=round(slope, 2),
                    fixed_ms=round(sweep[ks[0]] - slope * ks[0], 2))

            # (LVT_PROFILE_MS_ABLATE=1) decompose the window: rebuild the
            # K-step executable with attention identity / write-only
            # stubs — attributes the per-iteration gap vs a single step
            # (chained iterations measured SLOWER per iter than single
            # steps; find out which phase inflates inside the chain).
            if int(os.environ.get("LVT_PROFILE_MS_ABLATE", "0")):
                import light_vllm_tpu.decoding.attention as attn_mod

                orig_call2 = attn_mod.Attention.__call__

                def ms_write_only(self, q, k, v, kv_cache, meta,
                                  layer_idx=None, scales=None):
                    Tq = q.shape[0]
                    kh = k.reshape(Tq, self.num_kv_heads, self.head_dim)
                    vh = v.reshape(Tq, self.num_kv_heads, self.head_dim)
                    k_s = v_s = None
                    if scales is not None:
                        k_s = scales["k_scale"].astype(jnp.float32)
                        v_s = scales["v_scale"].astype(jnp.float32)
                    kv_cache = self.backend.write_kv(
                        kv_cache, kh, vh, meta, layer_idx=layer_idx,
                        k_scale=k_s, v_scale=v_s)
                    return q, kv_cache

                def ms_identity(self, q, k, v, kv_cache, meta,
                                layer_idx=None, scales=None):
                    return q, kv_cache

                def ms_read_only(self, q, k, v, kv_cache, meta,
                                 layer_idx=None, scales=None):
                    # attention WITHOUT the page write: if the window
                    # speeds up, the in-place write->read hazard on the
                    # aliased cache is what stalls the chained kernels.
                    T = q.shape[0]
                    qh = q.reshape(T, self.num_heads, self.head_dim)
                    if scales is not None:
                        k_s = scales["k_scale"].astype(jnp.float32)
                        qh = (qh.astype(jnp.float32) * k_s).astype(q.dtype)
                    out = self.backend.attention(
                        qh, kv_cache, meta, scale=self.scale,
                        sliding_window=self.sliding_window,
                        logits_soft_cap=self.logits_soft_cap,
                        layer_idx=layer_idx)
                    if scales is not None:
                        out = (out.astype(jnp.float32)
                               * scales["v_scale"].astype(jnp.float32)
                               ).astype(q.dtype)
                    return out.reshape(T, -1), kv_cache

                abl = {}
                try:
                    for name, stub in (("read_only", ms_read_only),
                                       ("write_only", ms_write_only),
                                       ("no_attn", ms_identity)):
                        attn_mod.Attention.__call__ = stub
                        fn3 = runner._make_multistep_fn(
                            d["use_topkp"], d["S"], d["P"], K,
                            runner.page_size, d["NT"], d["max_out"],
                            d["all_greedy"])
                        t3, _, kv = _time_fn_pipelined(
                            fn3, (runner.params, kv, dblob), kv_index=1)
                        abl[name] = round(t3 * 1e3, 2)
                finally:
                    attn_mod.Attention.__call__ = orig_call2
                # (history: an LVT_MS_FREEZE_ATTN_LENS variant measured
                # 431 vs 781 ms here, identifying the carried
                # seq_lens->scalar-prefetch chain as the in-chain
                # attention inflation; the ms body now derives
                # positions/seq_lens as window-entry + static t, making
                # the fix exact rather than approximate.)
                abl["full"] = round(t_ms_dev * 1e3, 2)
                abl["attn_read_per_iter_ms"] = round(
                    (t_ms_dev * 1e3 - abl["write_only"]) / K, 2)
                abl["kv_write_per_iter_ms"] = round(
                    (abl["write_only"] - abl["no_attn"]) / K, 2)
                abl["rest_per_iter_ms"] = round(abl["no_attn"] / K, 2)
                results["decode"]["ms_ablation"] = abl

            # (LVT_PROFILE_MS_LENS=frozen|clamped) time a single lens-mode
            # variant of the K-step window (see worker LVT_MS_LENS_MODE).
            mode = os.environ.get("LVT_PROFILE_MS_LENS")
            if mode:
                os.environ["LVT_MS_LENS_MODE"] = mode
                try:
                    fnm = runner._make_multistep_fn(
                        d["use_topkp"], d["S"], d["P"], K,
                        runner.page_size, d["NT"], d["max_out"],
                        d["all_greedy"])
                    tm, _, kv = _time_fn_pipelined(
                        fnm, (runner.params, kv, dblob), kv_index=1)
                    results["decode"][f"lens_{mode}_window_dev_ms"] = \
                        round(tm * 1e3, 2)
                finally:
                    os.environ.pop("LVT_MS_LENS_MODE", None)

    mfu_e2e_note = dict(
        matmul_params=mp,
        param_bytes_gib=round(param_bytes / 2**30, 2))
    print(json.dumps({"model": which, "phases": results,
                      **mfu_e2e_note}))


if __name__ == "__main__":
    main()
