"""Decoding processors: request → SequenceGroup, SchedulerOutput → tensors.

Counterpart of the reference's decoding processors (reference:
light_vllm/decoding/processor/input_processor.py,
light_vllm/decoding/processor/model_input_builder.py:22-378).

The input builder is where the TPU design diverges hardest from the
reference: instead of fully dynamic tensors it emits a *bucketed* flattened
batch —

    tokens  padded to the next member of the token-bucket ladder,
    seqs    padded to the next power of two,
    pages   fixed at max_model_len / page_size

— so the jitted step function compiles once per (T, S) bucket pair and every
subsequent step reuses a cached executable (XLA's replacement for CUDA
graphs; SURVEY.md §7 "bucketed padding").
"""

from typing import List, Optional

import numpy as np

from light_vllm_tpu.core.processor.input_processor import RequestProcessor
from light_vllm_tpu.core.processor.model_input_builder import \
    ModelInputBuilder
from light_vllm_tpu.core.schema.engine_io import TextRequest
from light_vllm_tpu.core.schema.execute_io import ExecuteInput
from light_vllm_tpu.decoding.sampling_params import SamplingParams
from light_vllm_tpu.decoding.schema import (DecodingModelInput,
                                            DecodingSchedulerOutput,
                                            DecodingWorkerInput,
                                            SamplingTensors, Sequence,
                                            SequenceGroup, SequenceStatus)
from light_vllm_tpu.utils import Counter, cdiv, next_power_of_2

# Bucket ladders. Deliberately COARSE: every (T, S, NT) combination is a
# separate XLA executable of the full model, and compiles are expensive
# (remote-compile latency dwarfs the padding waste of a 4x-spaced ladder —
# decode matmuls are weight-bandwidth-bound, so padding the batch axis is
# nearly free). The multi-step decode executable is K chained model calls,
# ~K times the compile cost, which punishes ladder churn hardest.
_DEFAULT_TOKEN_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384)
_SEQ_BUCKETS = (8, 32, 128, 256, 512, 2048)


def _env_buckets():
    from light_vllm_tpu import envs
    raw = envs.LVT_TOKEN_BUCKETS
    if raw:
        return tuple(sorted(int(x) for x in raw.split(",")))
    return _DEFAULT_TOKEN_BUCKETS


def pick_token_bucket(n: int, buckets=None) -> int:
    for b in buckets or _env_buckets():
        if n <= b:
            return b
    return next_power_of_2(n)


def pick_seq_bucket(n: int) -> int:
    for b in _SEQ_BUCKETS:
        if n <= b:
            return b
    return next_power_of_2(n)


def static_shapes_enabled() -> bool:
    """Static-shape mode pads every step to a fixed (T, S) per step kind so
    the executable set is enumerable (and precompilable) ahead of time —
    ramp-up, async scheduling and chunked prefill then never hit a mid-run
    XLA compile (each one stalls serving for the full remote-compile
    latency). Default: on for TPU, off for CPU (tests want tiny shapes)."""
    from light_vllm_tpu import envs
    v = str(envs.LVT_STATIC_SHAPES)
    if v == "auto":
        from light_vllm_tpu.platforms import current_platform
        return current_platform().is_tpu
    return v == "1"


# In non-chunked (whole-prompt) scheduling the static prefill T floor is
# capped here: padding every prefill step to a huge max_num_batched_tokens
# would waste compute when prompts are short; longer batches walk the
# bucket ladder lazily instead.
_STATIC_T_FLOOR_CAP = 2048


def static_prefill_token_bucket(max_num_batched_tokens: int,
                                enable_chunked_prefill: bool) -> int:
    cap = max_num_batched_tokens if enable_chunked_prefill \
        else min(max_num_batched_tokens, _STATIC_T_FLOOR_CAP)
    return pick_token_bucket(cap)


def blob_len(T: int, S: int, NT: int, P: int, max_out: int,
             prompt_len: int = 0, ban_len: int = 0, has_plp: bool = False,
             lp_width: int = 0, block_size: int = 16) -> int:
    """Total i32 length of the packed step blob (must mirror the
    `parts` concatenation in DecodingModelInputBuilder.__call__)."""
    n = 4 * T + 8 * S + 6 * S + 2 * NT + S * P + S * max_out
    # KV write plan: counts [2] + pages [2, NP] + rows [2, T]
    n += 2 + 2 * max(T // block_size, 1) + 2 * T
    n += S * prompt_len + S * ban_len + (T if has_plp else 0) + lp_width
    return n


class DecodingRequestProcessor(RequestProcessor):
    """TextRequest → SequenceGroup (tokenize, Sequence construction, eos
    wiring; reference: decoding/processor/input_processor.py)."""

    def __init__(self, tokenizer, block_size: int) -> None:
        self.tokenizer = tokenizer
        self.block_size = block_size
        self.seq_counter = Counter()

    @classmethod
    def from_engine(cls, engine) -> "DecodingRequestProcessor":
        return cls(engine.tokenizer,
                   engine.engine_config.cache_config.block_size)

    def __call__(self, request: TextRequest) -> SequenceGroup:
        inputs = request.inputs
        if not inputs.prompt_token_ids:
            inputs.prompt_token_ids = self.tokenizer.encode(inputs.prompt)
        params = request.params or SamplingParams()
        if params.truncate_prompt_tokens is not None:
            # Keep only the LAST k prompt tokens (reference:
            # backends/sampling_params.py truncate_prompt_tokens doc).
            inputs.prompt_token_ids = \
                inputs.prompt_token_ids[-params.truncate_prompt_tokens:]
        eos = self.tokenizer.eos_token_id
        # best_of (>= n) sibling sequences share the prompt's physical
        # blocks; the scheduler prefills the prompt once (siblings start
        # with all but the last position computed) and CoW splits them as
        # they diverge. For beam search best_of is the beam width
        # (reference: fork/append semantics, decoding/scheduler.py +
        # block_manager_v1.py; best_of semantics,
        # backends/sampling_params.py:285-297).
        seqs = [Sequence(next(self.seq_counter), inputs.prompt_token_ids,
                         self.block_size, eos_token_id=eos,
                         prompt=inputs.prompt)
                for _ in range(params.best_of)]
        return SequenceGroup(request_id=request.request_id, seqs=seqs,
                             sampling_params=params,
                             arrival_time=request.arrival_time,
                             metrics=request.metrics)


class DecodingModelInputBuilder(ModelInputBuilder):

    def __init__(self, block_size: int, max_model_len: int,
                 max_num_seqs: int, vocab_size: int,
                 max_num_batched_tokens: int = 0,
                 enable_chunked_prefill: bool = False,
                 static_shapes: Optional[bool] = None) -> None:
        self.block_size = block_size
        self.max_model_len = max_model_len
        self.max_num_seqs = max_num_seqs
        self.max_pages = cdiv(max_model_len, block_size)
        self.vocab_size = vocab_size
        self.max_num_batched_tokens = max_num_batched_tokens
        self.enable_chunked_prefill = enable_chunked_prefill
        self.static_shapes = static_shapes_enabled() \
            if static_shapes is None else static_shapes

    @classmethod
    def from_engine(cls, engine) -> "DecodingModelInputBuilder":
        cc = engine.engine_config.cache_config
        mc = engine.engine_config.model_config
        sc = engine.engine_config.scheduler_config
        return cls(cc.block_size, mc.max_model_len, sc.max_num_seqs,
                   mc.get_vocab_size(),
                   max_num_batched_tokens=sc.max_num_batched_tokens,
                   enable_chunked_prefill=sc.enable_chunked_prefill)

    TILE_Q = 128  # must match ops/prefill_attention_pallas.TILE_Q

    def __call__(self, scheduler_output: DecodingSchedulerOutput
                 ) -> ExecuteInput:
        metas = scheduler_output.seq_group_metadata_list
        dp = getattr(scheduler_output, "dp_size", 1)
        if dp > 1:
            return self._call_dp(scheduler_output, dp)
        model_input, info = self._build_one(metas,
                                            scheduler_output.multi_step)
        scheduler_output.sample_slots = info["sample_slots"]
        scheduler_output.sample_chunks = info["sample_chunks"]
        scheduler_output.sample_starts = info["sample_starts"]
        if info["lp_slot_map"]:
            scheduler_output.lp_slot_map = info["lp_slot_map"]
        scheduler_output.padded_tokens = info["padded_tokens"]
        worker_input = DecodingWorkerInput(
            blocks_to_swap_in=scheduler_output.blocks_to_swap_in,
            blocks_to_swap_out=scheduler_output.blocks_to_swap_out,
            blocks_to_copy=scheduler_output.blocks_to_copy)
        return ExecuteInput(worker_input=worker_input,
                            model_input=model_input)

    def _call_dp(self, scheduler_output: DecodingSchedulerOutput,
                 dp: int) -> ExecuteInput:
        """In-engine data parallelism: one sub-blob per dp partition, all
        built against the SAME executable spec (pass 1 builds each
        partition, pass 2 rebuilds any whose spec missed the merged
        maximum), stacked to a [dp, L] blob the runner shard_maps over the
        mesh "dp" axis. Host-visible indices (sample slots, chunk starts,
        logits-processor rows) are globalized with per-partition offsets
        (reference contract being matched: linear DP scaling with zero
        cross-worker state, prefill_only/executor/
        gpu_data_parallelism_executor.py:17-81)."""
        metas = scheduler_output.seq_group_metadata_list
        scheds = scheduler_output.scheduled_seq_groups
        part_idx: List[List[int]] = [[] for _ in range(dp)]
        for i, sched in enumerate(scheds):
            part_idx[sched.seq_group.dp_rank].append(i)
        part_metas = [[metas[i] for i in idx] for idx in part_idx]
        ms = scheduler_output.multi_step
        built = [self._build_one(pm, ms) for pm in part_metas]

        def spec_of(mi: DecodingModelInput):
            # num_prefill_seqs is deliberately absent: partitions may
            # genuinely differ there (the blob layout doesn't depend on
            # it; the merged executable is compiled with the max).
            return (mi.T, mi.S, mi.NT, mi.max_out, mi.prompt_len,
                    mi.ban_len, mi.has_plp, mi.plp_k, mi.lp_width,
                    mi.num_logprobs, mi.use_penalties, mi.use_topkp,
                    mi.all_greedy, mi.has_prompt_tokens, mi.decode_region)

        # Floors-to-fixpoint: a rebuild with merged floors can itself grow
        # a partition's spec (e.g. gaining a decode region pushes the
        # prefill cursor into the next token bucket), so iterate — every
        # field is monotonically non-decreasing and bucketed, so this
        # converges in a couple of rounds.
        for _ in range(4):
            if len({spec_of(mi) for mi, _ in built}) == 1:
                break
            floors = dict(
                any_prefill=any(mi.num_prefill_seqs for mi, _ in built),
                any_decode=any(mi.decode_region for mi, _ in built),
                T=max(mi.T for mi, _ in built),
                S=max(mi.S for mi, _ in built),
                max_out=max(mi.max_out for mi, _ in built),
                prompt_len=max(mi.prompt_len for mi, _ in built),
                ban_len=max(mi.ban_len for mi, _ in built),
                has_plp=any(mi.has_plp for mi, _ in built),
                plp_k=max(mi.plp_k for mi, _ in built),
                lp_width=max(mi.lp_width for mi, _ in built),
                num_logprobs=max(mi.num_logprobs for mi, _ in built),
                use_penalties=any(mi.use_penalties for mi, _ in built),
                use_topkp=any(mi.use_topkp for mi, _ in built),
                force_sampled=not all(mi.all_greedy for mi, _ in built),
            )
            built = [self._build_one(pm, ms, floors=floors)
                     for pm in part_metas]
        specs = {spec_of(mi) for mi, _ in built}
        assert len(specs) == 1, specs

        mi0 = built[0][0]
        blob = np.stack([mi.blob for mi, _ in built])
        merged = DecodingModelInput(
            blob=blob, T=mi0.T, S=mi0.S, NT=mi0.NT, P=mi0.P,
            max_out=mi0.max_out, has_prompt_tokens=mi0.has_prompt_tokens,
            prompt_len=mi0.prompt_len,
            num_seqs=sum(mi.num_seqs for mi, _ in built),
            num_decode_tokens=sum(mi.num_decode_tokens
                                  for mi, _ in built),
            decode_region=mi0.decode_region,
            num_prefill_seqs=max(mi.num_prefill_seqs for mi, _ in built),
            num_logprobs=mi0.num_logprobs,
            use_penalties=mi0.use_penalties, use_topkp=mi0.use_topkp,
            all_greedy=mi0.all_greedy, ban_len=mi0.ban_len,
            has_plp=mi0.has_plp, plp_k=mi0.plp_k, lp_width=mi0.lp_width,
            multi_step=min((mi.multi_step for mi, _ in built
                            if mi.num_seqs), default=1))

        # Scatter per-partition info back to global meta order with
        # partition offsets (slot += p*S, token starts += p*T,
        # logits-processor rows += p*lp_width).
        n = len(metas)
        slots: List[Optional[list]] = [None] * n
        chunks: List[Optional[list]] = [None] * n
        starts: List[Optional[list]] = [None] * n
        lp_map = {}
        for p, ((mi, info), idx) in enumerate(zip(built, part_idx)):
            so, to = p * mi0.S, p * mi0.T
            for j, gi in enumerate(idx):
                slots[gi] = [s + so for s in info["sample_slots"][j]]
                chunks[gi] = info["sample_chunks"][j]
                starts[gi] = [s + to for s in info["sample_starts"][j]]
            for slot, row in info["lp_slot_map"].items():
                lp_map[slot + so] = row + p * mi0.lp_width
        scheduler_output.sample_slots = slots
        scheduler_output.sample_chunks = chunks
        scheduler_output.sample_starts = starts
        if lp_map:
            scheduler_output.lp_slot_map = lp_map
        scheduler_output.padded_tokens = dp * mi0.T
        worker_input = DecodingWorkerInput(
            blocks_to_swap_in=scheduler_output.blocks_to_swap_in,
            blocks_to_swap_out=scheduler_output.blocks_to_swap_out,
            blocks_to_copy=scheduler_output.blocks_to_copy)
        return ExecuteInput(worker_input=worker_input, model_input=merged)

    def _build_one(self, metas, multi_step: int, floors: Optional[dict]
                   = None):
        """Build one partition's blob + model input. `floors` (dp mode)
        forces every executable-spec dimension up to the merged
        cross-partition value so all partitions share one compiled step."""
        f = floors or {}

        # Pass 1: collect rows, decodes first then prefills (layout
        # contract documented on DecodingModelInput).
        decode_rows: List[dict] = []
        prefill_rows: List[dict] = []
        meta_row_refs: List[List[dict]] = []
        for meta in metas:
            refs = []
            for branch, (seq_id, data) in enumerate(meta.seq_data.items()):
                n_computed = data.get_num_computed_tokens()
                chunk = meta.token_chunk_size if meta.is_prompt else 1
                new_ids = data.get_token_ids()[n_computed:n_computed + chunk]
                row = {
                    "query_len": len(new_ids),
                    "kv_len": n_computed + len(new_ids),
                    "ctx_len": n_computed,
                    "new_ids": new_ids,
                    "block_table": meta.block_tables[seq_id],
                    "meta": meta,
                    "data": data,
                    "branch": branch,
                }
                (prefill_rows if len(new_ids) > 1 or meta.is_prompt
                 else decode_rows).append(row)
                refs.append(row)
            meta_row_refs.append(refs)

        D_real = len(decode_rows)
        n_prefill = len(prefill_rows)
        # dp floors: the step KIND (pure prefill / mixed / pure decode)
        # must match across partitions — a partition without its own
        # prefills/decodes still compiles the merged kind's regions.
        kind_prefill = bool(n_prefill or f.get("any_prefill"))
        kind_decode = bool(D_real or f.get("any_decode"))
        TQ = self.TILE_Q
        if self.static_shapes:
            # Fixed regions per step KIND (pure prefill / mixed / pure
            # decode): the executable set becomes enumerable ahead of time
            # (see static_precompile_specs), so ramp-up and async modes
            # never discover new (T, S) shapes mid-run. Decode rows are
            # weight-bandwidth-bound, so padding the decode region to the
            # max_num_seqs cap is nearly free.
            if kind_prefill:
                decode_region = cdiv(self.max_num_seqs, TQ) * TQ \
                    if kind_decode else 0
            else:
                decode_region = pick_seq_bucket(self.max_num_seqs)
        elif kind_prefill:
            decode_region = cdiv(max(D_real, 1), TQ) * TQ \
                if kind_decode else 0
        else:
            decode_region = pick_seq_bucket(max(D_real, 1))

        # Assign flat rows + seq slots.
        for i, row in enumerate(decode_rows):
            row["slot"] = i
            row["chunk_start"] = i
        cursor = decode_region
        tiles: List[tuple] = []
        for k, row in enumerate(prefill_rows):
            row["slot"] = decode_region + k
            row["chunk_start"] = cursor
            for t in range(cdiv(row["query_len"], TQ)):
                tiles.append((row["slot"], cursor + t * TQ))
            cursor += cdiv(row["query_len"], TQ) * TQ
        if kind_prefill:
            T = max(pick_token_bucket(max(cursor, 1)), decode_region)
            if self.static_shapes and self.max_num_batched_tokens:
                # Pad up to the scheduler budget's bucket: steady-state and
                # tail/ramp steps then share ONE executable (the budget's
                # tile accounting keeps cursor inside this bucket).
                T = max(T, static_prefill_token_bucket(
                    self.max_num_batched_tokens,
                    self.enable_chunked_prefill))
        else:
            # Pure decode: one token per row — T is exactly the (bucketed)
            # decode region so the multi-step T == S eligibility holds.
            T = decode_region
        T = max(T, f.get("T", 0))
        S_real = decode_region + n_prefill if kind_prefill else D_real
        # The decode kernel runs over rows [0, decode_region): the seq-slot
        # arrays must cover that range or the kernel reads junk block ids.
        S = max(pick_seq_bucket(max(S_real, 1)), decode_region)
        if self.static_shapes and kind_prefill:
            # Prefill slots live at [decode_region, decode_region +
            # n_prefill); fix S at the worst case so slot-count ramps don't
            # mint new executables.
            S = max(S, pick_seq_bucket(decode_region + self.max_num_seqs))
        S = max(S, f.get("S", 0))

        input_ids = np.zeros(T, dtype=np.int32)
        pos_arr = np.zeros(T, dtype=np.int32)
        slot_arr = np.zeros(T, dtype=np.int32)  # pad slots → null page 0
        seq_ids = np.full(T, S - 1, dtype=np.int32)  # pads → last slot
        block_tables = np.zeros((S, self.max_pages), dtype=np.int32)
        seq_lens = np.zeros(S, dtype=np.int32)
        ctx_lens = np.zeros(S, dtype=np.int32)
        chunk_starts = np.zeros(S, dtype=np.int32)
        chunk_lens = np.zeros(S, dtype=np.int32)
        logits_idx = np.zeros(S, dtype=np.int32)

        all_rows = decode_rows + prefill_rows
        bs = self.block_size
        for row in all_rows:
            s = row["slot"]
            start = row["chunk_start"]
            bt = np.asarray(row["block_table"][:self.max_pages],
                            dtype=np.int32)  # lookahead may exceed
            block_tables[s, :len(bt)] = bt
            seq_lens[s] = row["kv_len"]
            ctx_lens[s] = row["ctx_len"]
            chunk_starts[s] = start
            chunk_lens[s] = row["query_len"]
            logits_idx[s] = start + row["query_len"] - 1
            q = row["query_len"]
            if q:
                sl = slice(start, start + q)
                pos = np.arange(row["ctx_len"], row["ctx_len"] + q,
                                dtype=np.int32)
                input_ids[sl] = row["new_ids"]
                pos_arr[sl] = pos
                seq_ids[sl] = s
                slot_arr[sl] = bt[pos // bs] * bs + pos % bs

        # KV write plan (ops/kv_write_pallas.py): full-page DMA runs for
        # aligned prefill pages, single-row DMAs for decode tokens and
        # chunk-boundary partials. Padded rows are simply not written (the
        # jnp scatter needed the trash page; DMAs don't).
        NP = max(T // bs, 1)
        w_counts = np.zeros(2, dtype=np.int32)
        w_pages = np.zeros((2, NP), dtype=np.int32)
        w_rows = np.zeros((2, T), dtype=np.int32)
        np_c = nr_c = 0
        if D_real:
            w_rows[0, :D_real] = slot_arr[:D_real]
            w_rows[1, :D_real] = np.arange(D_real, dtype=np.int32)
            nr_c = D_real
        for row in prefill_rows:
            q = row["query_len"]
            if not q:
                continue
            start, ctx = row["chunk_start"], row["ctx_len"]
            p0 = -(-ctx // bs) * bs        # first aligned page start ≥ ctx
            p1 = ((ctx + q) // bs) * bs    # end of the last full page
            if p1 > p0:
                rr = start + np.arange(p0 - ctx, p1 - ctx, bs)
                n = len(rr)
                w_pages[0, np_c:np_c + n] = slot_arr[rr]
                w_pages[1, np_c:np_c + n] = rr
                np_c += n
                edges = ((0, p0 - ctx), (p1 - ctx, q))
            else:
                edges = ((0, q),)
            for a, b in edges:
                if b > a:
                    rr = start + np.arange(a, b)
                    n = b - a
                    w_rows[0, nr_c:nr_c + n] = slot_arr[rr]
                    w_rows[1, nr_c:nr_c + n] = rr
                    nr_c += n
        w_counts[0], w_counts[1] = np_c, nr_c

        # Pad tokens default seq_ids to slot S-1. If that slot is real the
        # reference impl computes (ignored) extra rows — harmless: pad KV
        # writes go to the null page and pad outputs are never gathered.
        # NT is tied to T (the max tiles T tokens can produce) so the tile
        # count never adds an executable dimension; padded tiles carry
        # seq = -1 and the prefill kernel skips them.
        NT = max(T // TQ, 1) if kind_prefill else 1
        tile_seq = np.full(NT, -1, dtype=np.int32)
        tile_qstart = np.zeros(NT, dtype=np.int32)
        for i, (s, qs) in enumerate(tiles):
            tile_seq[i] = s
            tile_qstart[i] = qs

        # slot + chunk maps for the output processor, in meta iteration order
        info = {
            "sample_slots": [[row["slot"] for row in refs]
                             for refs in meta_row_refs],
            "sample_chunks": [[row["query_len"] for row in refs]
                              for refs in meta_row_refs],
            "sample_starts": [[row["chunk_start"] for row in refs]
                              for refs in meta_row_refs],
            "lp_slot_map": {},
            # Padding-occupancy metric: the executable computes T token
            # rows for this many real ones (StatsLogger reports the ratio).
            "padded_tokens": T,
        }

        # prompt_logprobs: target-id row per prefill token (the NEXT prompt
        # token; -1 = no target). The step computes, chunked over T, the
        # logprob of each target under the post-log_softmax distribution at
        # that position + top-k (reference: backends/sampler.py get_logprobs
        # prompt path). Only branch 0 carries prompt rows (prefill runs
        # once per group).
        plp_params = [r["meta"].sampling_params for r in prefill_rows
                      if r["meta"].sampling_params.prompt_logprobs
                      is not None]
        has_plp = bool(plp_params) or bool(f.get("has_plp"))
        plp_k = max([sp.prompt_logprobs for sp in plp_params]
                    + [0, f.get("plp_k", 0)])
        plp_targets = None
        if has_plp:
            plp_targets = np.full(T, -1, dtype=np.int32)
            for row in prefill_rows:
                if row["meta"].sampling_params.prompt_logprobs is None:
                    continue
                prompt = row["data"].prompt_token_ids
                start, ctx = row["chunk_start"], row["ctx_len"]
                for i in range(row["query_len"]):
                    pos = ctx + i
                    if pos + 1 < len(prompt):
                        plp_targets[start + i] = prompt[pos + 1]

        # per-request logits_processors: affected rows take the host-side
        # resample path — the step returns their raw logits rows
        # (sampling_params.py logits_processors docstring).
        lp_rows = [r for r in all_rows
                   if r["meta"].sampling_params.logits_processors]
        lp_width = next_power_of_2(len(lp_rows)) if lp_rows else 0
        lp_width = max(lp_width, f.get("lp_width", 0))
        lp_idx = None
        if lp_width:
            lp_idx = np.zeros(lp_width, dtype=np.int32)
            for j, r in enumerate(lp_rows):
                lp_idx[j] = r["slot"]
            info["lp_slot_map"] = {
                r["slot"]: j for j, r in enumerate(lp_rows)}

        (seq_f32, top_k_arr, seeds, out_tokens, prompt_tokens, use_penalties,
         use_topkp, all_greedy, ban_tokens, ban_active) = \
            self._build_sampling(all_rows, S, f)
        def _required_logprobs(sp) -> int:
            k = sp.logprobs or 0
            if sp.use_beam_search:
                # HF-style expansion needs the top 2*width candidates per
                # beam (the union of per-beam top-2W covers the global
                # top-2W of the flattened [W, V] scores).
                k = max(k, 2 * sp.best_of)
            return k

        num_logprobs = max(
            [_required_logprobs(r["meta"].sampling_params)
             for r in all_rows] + [0, f.get("num_logprobs", 0)])

        tok_i32 = np.stack([input_ids, pos_arr, slot_arr, seq_ids])
        seq_i32 = np.stack([seq_lens, ctx_lens, chunk_starts, chunk_lens,
                            logits_idx, top_k_arr,
                            seeds.view(np.int32), ban_active])
        tiles = np.stack([tile_seq, tile_qstart])

        # One flat i32 blob = one host→device transfer per step (transfer
        # *latency*, not bandwidth, dominates these small buffers).
        parts = [tok_i32.ravel(), seq_i32.ravel(),
                 seq_f32.astype(np.float32).view(np.int32).ravel(),
                 tiles.ravel(), block_tables.ravel(), out_tokens.ravel(),
                 w_counts, w_pages.ravel(), w_rows.ravel()]
        if prompt_tokens is not None:
            parts.append(prompt_tokens.ravel())
        if ban_tokens is not None:
            parts.append(ban_tokens.ravel())
        if plp_targets is not None:
            parts.append(plp_targets)
        if lp_idx is not None:
            parts.append(lp_idx)
        blob = np.concatenate(parts)

        model_input = DecodingModelInput(
            blob=blob,
            T=T, S=S, NT=NT, P=self.max_pages,
            max_out=out_tokens.shape[1],
            has_prompt_tokens=prompt_tokens is not None,
            prompt_len=0 if prompt_tokens is None
            else prompt_tokens.shape[1],
            num_seqs=S_real, num_decode_tokens=D_real,
            decode_region=decode_region, num_prefill_seqs=n_prefill,
            num_logprobs=num_logprobs, use_penalties=use_penalties,
            use_topkp=use_topkp, all_greedy=all_greedy,
            ban_len=0 if ban_tokens is None else ban_tokens.shape[1],
            has_plp=has_plp, plp_k=plp_k, lp_width=lp_width,
            multi_step=multi_step if n_prefill == 0 else 1)
        return model_input, info

    def _build_sampling(self, seq_rows: List[dict], S: int,
                        f: Optional[dict] = None):
        f = f or {}
        temperature = np.zeros(S, dtype=np.float32)
        top_p = np.ones(S, dtype=np.float32)
        top_k = np.zeros(S, dtype=np.int32)
        min_p = np.zeros(S, dtype=np.float32)
        presence = np.zeros(S, dtype=np.float32)
        frequency = np.zeros(S, dtype=np.float32)
        repetition = np.ones(S, dtype=np.float32)
        seeds = np.zeros(S, dtype=np.uint32)
        needs_prompt = any(
            r["meta"].sampling_params.presence_penalty != 0
            or r["meta"].sampling_params.frequency_penalty != 0
            or r["meta"].sampling_params.repetition_penalty != 1.0
            for r in seq_rows) or bool(f.get("use_penalties"))
        if needs_prompt:
            max_out = max([len(r["data"].output_token_ids)
                           for r in seq_rows] + [1])
            max_out = max(next_power_of_2(max_out), f.get("max_out", 1))
        else:
            # No penalties anywhere in the batch: keep the matrix a fixed
            # [S, 1] so output growth never changes the jit cache key.
            max_out = 1
        # output-token matrix for penalty computation; vocab_size = "none"
        out_tokens = np.full((S, max_out), self.vocab_size, dtype=np.int32)
        prompt_tokens = None
        if needs_prompt:
            max_in = next_power_of_2(max(
                [len(r["data"].prompt_token_ids) for r in seq_rows] + [1]))
            max_in = max(max_in, f.get("prompt_len", 1))
            prompt_tokens = np.full((S, max_in), self.vocab_size,
                                    dtype=np.int32)
        # min_tokens: rows still under min_tokens get their stop tokens
        # (EOS + stop_token_ids) banned device-side (reference:
        # sampler.py _apply_min_tokens_penalty).
        ban_rows = {}
        for row in seq_rows:
            sp = row["meta"].sampling_params
            if sp.min_tokens <= 0:
                continue
            if len(row["data"].output_token_ids) >= sp.min_tokens:
                continue
            ids = list(sp.stop_token_ids)
            eos = row["meta"].eos_token_id
            if not sp.ignore_eos and eos is not None:
                ids.append(eos)
            if ids:
                ban_rows[row["slot"]] = ids
        ban_tokens = None
        ban_active = np.zeros(S, dtype=np.int32)
        if ban_rows or f.get("ban_len"):
            ban_w = max(
                next_power_of_2(max([len(v) for v in ban_rows.values()]
                                    + [1])),
                f.get("ban_len", 1))
            ban_tokens = np.full((S, ban_w), -1, dtype=np.int32)
            for slot, ids in ban_rows.items():
                ban_tokens[slot, :len(ids)] = ids
                ban_active[slot] = 1

        rng = np.random.default_rng()
        for row in seq_rows:
            i = row["slot"]
            sp: SamplingParams = row["meta"].sampling_params
            temperature[i] = sp.temperature
            top_p[i] = sp.top_p
            top_k[i] = sp.top_k if sp.top_k > 0 else 0
            min_p[i] = sp.min_p
            presence[i] = sp.presence_penalty
            frequency[i] = sp.frequency_penalty
            repetition[i] = sp.repetition_penalty
            if sp.seed is not None:
                # deterministic stream: (seed, step index, branch) so n>1
                # branches with the same seed still diverge
                seeds[i] = (sp.seed
                            + 0x9E3779B9 * len(row["data"].output_token_ids)
                            + 0x85EBCA6B * row.get("branch", 0)) & 0xFFFFFFFF
            else:
                seeds[i] = rng.integers(0, 2**32, dtype=np.uint32)
            outs = row["data"].output_token_ids[:max_out] if needs_prompt \
                else []
            out_tokens[i, :len(outs)] = outs
            if prompt_tokens is not None:
                ins = row["data"].prompt_token_ids
                prompt_tokens[i, :len(ins)] = ins[:prompt_tokens.shape[1]]
        use_penalties = needs_prompt
        use_topkp = bool(np.any(top_k > 0) or np.any(top_p < 1.0)
                         or np.any(min_p > 0)) or bool(f.get("use_topkp"))
        all_greedy = bool(np.all(temperature < 1e-5)) \
            and not f.get("force_sampled")
        seq_f32 = np.stack([temperature, top_p, min_p, presence, frequency,
                            repetition])
        return (seq_f32, top_k, seeds, out_tokens, prompt_tokens,
                use_penalties, use_topkp, all_greedy, ban_tokens, ban_active)


def static_precompile_specs(max_num_seqs: int, max_num_batched_tokens: int,
                            enable_chunked_prefill: bool, max_pages: int,
                            num_scheduler_steps: int = 1,
                            greedy_only: bool = False,
                            block_size: int = 16):
    """Enumerate the executable set static-shape mode can reach on the
    common (no penalties / no logprobs / no prompt_logprobs) path, for AOT
    precompilation at engine init.

    Returns a list of (key, blob_len) where key is either the step-fn key
    tuple (DecodingModelRunner._make_step_fn argument order) or the
    multi-step key ("ms", ...). Batches outside this set (penalties,
    logprobs, per-request logits processors) fall back to lazy jit."""
    TQ = DecodingModelInputBuilder.TILE_Q
    P = max_pages
    S_dec = pick_seq_bucket(max_num_seqs)
    dr_mix = cdiv(max_num_seqs, TQ) * TQ
    T_pre = static_prefill_token_bucket(max_num_batched_tokens,
                                        enable_chunked_prefill)
    S_pre = pick_seq_bucket(max_num_seqs)
    S_mix = pick_seq_bucket(dr_mix + max_num_seqs)

    # (use_topkp, all_greedy) sampling variants.
    variants = [(False, True)] if greedy_only \
        else [(False, True), (True, False)]
    specs = []
    for topkp, greedy in variants:
        # step key order: (use_penalties, use_topkp, num_logprobs,
        # has_prompt_tokens, decode_region, min(num_prefill_seqs, 1), T, S,
        # NT, P, max_out, prompt_len, ban_len, all_greedy, has_plp, plp_k,
        # lp_width)
        def step_key(dr, pref, T, S, NT):
            return (False, topkp, 0, False, dr, pref, T, S, NT, P, 1,
                    0, 0, greedy, False, 0, 0)

        # pure prefill
        specs.append((step_key(0, 1, T_pre, S_pre, max(T_pre // TQ, 1)),
                      blob_len(T_pre, S_pre, max(T_pre // TQ, 1), P, 1,
                               block_size=block_size)))
        if enable_chunked_prefill:
            # mixed decode+prefill (only chunked scheduling emits these)
            specs.append(
                (step_key(dr_mix, 1, max(T_pre, dr_mix), S_mix,
                          max(max(T_pre, dr_mix) // TQ, 1)),
                 blob_len(max(T_pre, dr_mix), S_mix,
                          max(max(T_pre, dr_mix) // TQ, 1), P, 1,
                          block_size=block_size)))
        # pure decode, single step
        specs.append((step_key(S_dec, 0, S_dec, S_dec, 1),
                      blob_len(S_dec, S_dec, 1, P, 1,
                               block_size=block_size)))
        if num_scheduler_steps > 1:
            # multi-step key order mirrors DecodingModelRunner.execute
            specs.append((("ms", topkp, S_dec, P, num_scheduler_steps, 1, 1,
                           greedy),
                          blob_len(S_dec, S_dec, 1, P, 1,
                                   block_size=block_size)))
    return specs
