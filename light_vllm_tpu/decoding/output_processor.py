"""Decoding output processing: pythonize device samples, append tokens,
incremental detokenization, stop checking.

(reference: light_vllm/decoding/processor/output_processor.py:14-105,
processor/utils/single_step.py:15, processor/utils/stop_checker.py:8)
"""

import copy
from typing import Dict, List, Optional

import numpy as np

from light_vllm_tpu.core.processor.output_processor import OutputProcessor
from light_vllm_tpu.core.schema.engine_io import (CompletionOutput, Logprob,
                                                  RequestOutput)
from light_vllm_tpu.decoding.sampling_params import SamplingParams
from light_vllm_tpu.decoding.schema import (DecodingExecuteOutput,
                                            DecodingSchedulerOutput,
                                            Sequence, SequenceStatus)
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _logsumexp(x: np.ndarray) -> float:
    m = np.max(x[np.isfinite(x)]) if np.isfinite(x).any() else 0.0
    return m + np.log(np.sum(np.exp(x - m)))


class StopChecker:
    """min_tokens → EOS → stop token ids → stop strings → max len
    (reference: processor/utils/stop_checker.py:8)."""

    def __init__(self, max_model_len: int) -> None:
        self.max_model_len = max_model_len

    def maybe_stop(self, seq: Sequence, params: SamplingParams,
                   new_text: str) -> None:
        out_len = seq.get_output_len()
        last_token = seq.get_last_token_id()

        if out_len < params.min_tokens:
            # EOS / stop-token ids are banned device-side in the sampler
            # while under min_tokens (ops/sampling.apply_min_tokens_ban),
            # so they cannot appear here; stop checks are skipped to match
            # (reference: stop_checker.py min_tokens gate).
            pass
        else:
            if (not params.ignore_eos and seq.eos_token_id is not None
                    and last_token == seq.eos_token_id):
                seq.status = SequenceStatus.FINISHED_STOPPED
                return
            if last_token in params.stop_token_ids:
                seq.status = SequenceStatus.FINISHED_STOPPED
                seq.stop_reason = last_token
                return
            if params.stop and new_text:
                stop = self._check_stop_strings(seq, params)
                if stop is not None:
                    seq.status = SequenceStatus.FINISHED_STOPPED
                    seq.stop_reason = stop
                    return

        if params.max_tokens is not None and out_len >= params.max_tokens:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return
        if seq.get_len() >= self.max_model_len:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return

    def _check_stop_strings(self, seq: Sequence,
                            params: SamplingParams) -> Optional[str]:
        for stop_str in params.stop:
            idx = seq.output_text.find(stop_str)
            if idx != -1:
                if not params.include_stop_str_in_output:
                    seq.output_text = seq.output_text[:idx]
                else:
                    seq.output_text = seq.output_text[:idx + len(stop_str)]
                return stop_str
        return None


class DecodingOutputProcessor(OutputProcessor):

    def __init__(self, tokenizer, max_model_len: int,
                 scheduler=None, seq_counter=None) -> None:
        self.tokenizer = tokenizer
        self.max_model_len = max_model_len
        self.stop_checker = StopChecker(max_model_len)
        # Beam reselection forks/frees KV block tables and mints new seq
        # ids (reference analog: the seq fork/free plumbing of
        # decoding/scheduler.py fork_seq/free_seq).
        self.scheduler = scheduler
        self.seq_counter = seq_counter

    @classmethod
    def from_engine(cls, engine) -> "DecodingOutputProcessor":
        return cls(engine.tokenizer,
                   engine.engine_config.model_config.max_model_len,
                   scheduler=engine.scheduler,
                   seq_counter=getattr(engine.request_processor,
                                       "seq_counter", None))

    def __call__(self, scheduler_output: DecodingSchedulerOutput,
                 execute_output: DecodingExecuteOutput
                 ) -> List[RequestOutput]:
        outputs: List[RequestOutput] = []
        metas = scheduler_output.seq_group_metadata_list
        if metas:
            raw = np.asarray(execute_output.next_tokens)
            topk_lp = topk_ids = None
            if raw.ndim == 3:
                # multi-step ring [K, 2, S]
                sub_steps = [(raw[t, 0], raw[t, 1].view(np.float32))
                             for t in range(raw.shape[0])]
            else:
                tokens, chosen_lp, topk_lp, topk_ids = \
                    execute_output.pythonize()
                sub_steps = [(tokens, chosen_lp)]
            for sched, meta, slots, chunks, starts in zip(
                    scheduler_output.scheduled_seq_groups, metas,
                    scheduler_output.sample_slots,
                    scheduler_output.sample_chunks,
                    scheduler_output.sample_starts):
                g = sched.seq_group
                if (meta.is_prompt
                        and meta.sampling_params.prompt_logprobs is not None
                        and execute_output.plp_chosen is not None):
                    self._process_prompt_logprobs(g, meta, chunks[0],
                                                  starts[0], execute_output)
                if meta.sampling_params.use_beam_search:
                    self._process_beam_group(g, meta, slots, chunks,
                                             topk_lp, topk_ids)
                    outputs.append(self._to_request_output(g))
                    continue
                for seq_id, slot, chunk in zip(meta.seq_data, slots, chunks):
                    seq = g.seqs_dict[seq_id]
                    for step_idx, (tokens_t, lp_t) in enumerate(sub_steps):
                        if seq.is_finished():
                            break
                        token = int(tokens_t[slot])
                        lp = float(lp_t[slot]) if lp_t is not None else 0.0
                        if (meta.sampling_params.logits_processors
                                and meta.do_sample
                                and execute_output.lp_logits is not None
                                and slot in scheduler_output.lp_slot_map):
                            row = scheduler_output.lp_slot_map[slot]
                            token, lp = self._host_resample(
                                seq, meta.sampling_params,
                                np.asarray(execute_output.lp_logits)[row])
                        if (topk_lp is not None and meta.do_sample
                                and meta.sampling_params.logprobs):
                            seq.logprobs.append(self._build_logprob_dict(
                                seq, meta.sampling_params, topk_ids[slot],
                                topk_lp[slot], token, lp))
                        # advance computed-token count: full chunk on the
                        # first sub-step, one token per chained iteration
                        seq.data.update_num_computed_tokens(
                            chunk if step_idx == 0 else 1)
                        if not meta.do_sample:
                            continue  # non-final prefill chunk: no token
                        g.metrics.on_token()
                        seq.append_token_id(token, lp)
                        new_text = self._detokenize(seq,
                                                    meta.sampling_params)
                        self.stop_checker.maybe_stop(
                            seq, meta.sampling_params, new_text)
                outputs.append(self._to_request_output(g))
        for g in scheduler_output.ignored_seq_groups:
            outputs.append(self._to_request_output(g))
        return outputs

    # --- deferred-output (device-chained decode) path ----------------------
    def advance_placeholders(self, scheduler_output, K: int):
        """Advance every sequence of a deferred multi-step window by K
        PLACEHOLDER tokens so the scheduler can dispatch the next chained
        window without waiting for the device readback. Token values are
        backfilled later (backfill_deferred); the engine only defers
        windows whose host decisions are value-independent (ignore_eos,
        no stops/logprobs/penalties/detokenize, no finishes in-window,
        prefix caching off).

        Returns the per-seq output offsets the backfill writes into."""
        starts = {}
        for sched, meta, slots, chunks in zip(
                scheduler_output.scheduled_seq_groups,
                scheduler_output.seq_group_metadata_list,
                scheduler_output.sample_slots,
                scheduler_output.sample_chunks):
            g = sched.seq_group
            for seq_id, slot, chunk in zip(meta.seq_data, slots, chunks):
                seq = g.seqs_dict[seq_id]
                starts[seq_id] = seq.get_output_len()
                for t in range(K):
                    seq.data.update_num_computed_tokens(
                        chunk if t == 0 else 1)
                    g.metrics.on_token()
                    seq.append_token_id(0, 0.0)
        return starts

    def backfill_deferred(self, scheduler_output, execute_output, starts):
        """Resolve a deferred window: overwrite its placeholder ids with
        the real device-sampled tokens and emit the request outputs."""
        raw = np.asarray(execute_output.next_tokens)  # [K, 2, S]
        K = raw.shape[0]
        outputs = []
        for sched, meta, slots, chunks in zip(
                scheduler_output.scheduled_seq_groups,
                scheduler_output.seq_group_metadata_list,
                scheduler_output.sample_slots,
                scheduler_output.sample_chunks):
            g = sched.seq_group
            for seq_id, slot, chunk in zip(meta.seq_data, slots, chunks):
                seq = g.seqs_dict[seq_id]
                start = starts[seq_id]
                for t in range(K):
                    seq.data.output_token_ids[start + t] = \
                        int(raw[t, 0, slot])
                    seq.data.cumulative_logprob += float(
                        raw[t, 1, slot].view(np.float32))
            outputs.append(self._to_request_output(g))
        return outputs

    # --- beam search --------------------------------------------------------
    # HF BeamSearchScorer semantics (the reference carries the same scoring
    # vestigially at decoding/schema/sequence.py:350 get_beam_search_score):
    # each step every live beam contributes its top-2W (token, logprob)
    # candidates; the global top-2W are scanned in score order — EOS
    # candidates ranked < W become finished hypotheses, others fill the W
    # live-beam slots. Hypothesis score = cum_logprob / len^length_penalty
    # (len excludes the trailing EOS). The device side needs no beam
    # support at all: the step already returns top-k log-softmax rows, and
    # reparenting rides the block manager's CoW fork.

    @staticmethod
    def _beam_score(seq: Sequence, length_penalty: float) -> float:
        ln = seq.get_len()
        if (seq.eos_token_id is not None and ln
                and seq.get_last_token_id() == seq.eos_token_id):
            ln -= 1
        return seq.data.cumulative_logprob / max(ln, 1) ** length_penalty

    def _beam_hyps(self, g) -> List[Sequence]:
        if not hasattr(g, "beam_hyps"):
            g.beam_hyps = []
        return g.beam_hyps

    def _beam_add_hyp(self, g, hyp: Sequence, sp: SamplingParams) -> None:
        """Add a finished hypothesis, evicting the worst beyond width W."""
        hyps = self._beam_hyps(g)
        hyps.append(hyp)
        g.add_seq(hyp)
        if len(hyps) > sp.best_of:
            hyps.sort(key=lambda s: -self._beam_score(s, sp.length_penalty))
            worst = hyps.pop()
            g.remove_seq(worst.seq_id)

    def _beam_done(self, g, sp: SamplingParams, best_cum: float,
                   cur_len: int, prompt_len: int) -> bool:
        hyps = self._beam_hyps(g)
        if len(hyps) < sp.best_of:
            return False
        if sp.early_stopping is True:
            return True
        lp = sp.length_penalty
        worst = min(self._beam_score(s, lp) for s in hyps)
        if sp.early_stopping == "never" and lp > 0.0:
            max_len = min(prompt_len + (sp.max_tokens or self.max_model_len),
                          self.max_model_len)
            return worst >= best_cum / max_len ** lp
        return worst >= best_cum / cur_len ** lp

    def _beam_fork(self, parent: Sequence, with_blocks: bool) -> Sequence:
        child = parent.fork(next(self.seq_counter))
        if with_blocks:
            self.scheduler.block_manager.fork(parent, child)
        return child

    def _process_beam_group(self, g, meta, slots, chunks,
                            topk_lp, topk_ids) -> None:
        sp = meta.sampling_params
        W = sp.best_of
        running = [g.seqs_dict[sid] for sid in meta.seq_data]
        for seq, chunk in zip(running, chunks):
            seq.data.update_num_computed_tokens(chunk)
        if not meta.do_sample:
            return  # non-final prefill chunk
        assert topk_lp is not None and topk_ids is not None, \
            "beam groups must run in a step compiled with num_logprobs>=2W"
        g.metrics.on_token()
        eos = meta.eos_token_id if not sp.ignore_eos else None
        bm = self.scheduler.block_manager

        first = running[0].get_output_len() == 0
        if first:
            # Prefill just sampled: only the lead sequence is scheduled;
            # its distribution seeds every beam (HF: beam_scores
            # initialized [0, -inf, ...] — only beam 0 contributes).
            beams = [s for s in g.get_seqs() if not s.is_finished()]
            parents = [running[0]]
            parent_slots = [slots[0]]
        else:
            beams = running
            parents = running
            parent_slots = list(slots)

        L = parents[0].get_len()  # pre-append length (equal across beams)
        cands = []  # (joint cum logprob, token, parent index)
        for i, (seq, slot) in enumerate(zip(parents, parent_slots)):
            base = seq.data.cumulative_logprob
            for t, lp in zip(topk_ids[slot][:2 * W], topk_lp[slot][:2 * W]):
                cands.append((base + float(lp), int(t), i))
        cands.sort(key=lambda c: -c[0])
        cands = cands[:2 * W]

        selected = []  # (parent index, token, joint cum logprob)
        for rank, (score, tok, pi) in enumerate(cands):
            if eos is not None and tok == eos:
                if rank >= W:
                    continue
                # Finished hypothesis: data-only fork (no KV needed again),
                # EOS appended so outputs carry it (HF finalize appends
                # eos_token_id after each hypothesis too).
                hyp = self._beam_fork(parents[pi], with_blocks=False)
                hyp.append_token_id(
                    tok, score - parents[pi].data.cumulative_logprob)
                hyp.data.update_num_computed_tokens(
                    hyp.data.get_num_uncomputed_tokens())
                self._detokenize(hyp, sp)
                hyp.status = SequenceStatus.FINISHED_STOPPED
                self._beam_add_hyp(g, hyp, sp)
            elif len(selected) < W:
                selected.append((pi, tok, score))

        done = self._beam_done(g, sp, cands[0][0] if cands else -np.inf,
                               L + 1, len(g.prompt_token_ids))
        if done:
            # HF is_done: current live beams are NOT added as hypotheses.
            self._beam_finalize(g, sp, beams, add_running=False)
            return

        # --- apply reselection: reuse each parent once, fork extras ------
        # All forks/copies happen BEFORE any append so children carry the
        # parents' pre-append state.
        new_beams = []  # (seq, token, joint score, parent slot)
        assigned = set()
        spare = [b for b in beams if b not in parents] if first else []
        for pi, tok, score in selected:
            parent = parents[pi]
            if pi not in assigned:
                assigned.add(pi)  # first use: advance the parent in place
                seq = parent
            elif spare:
                # First step: reuse a pre-allocated sibling slot (it
                # already shares the prompt's physical blocks).
                seq = spare.pop()
                seq.data = copy.deepcopy(parent.data)
                seq.output_text = parent.output_text
                seq.tokens = list(parent.tokens) if parent.tokens else None
                seq.prefix_offset = parent.prefix_offset
                seq.read_offset = parent.read_offset
                seq.logprobs = list(parent.logprobs)
            else:
                seq = self._beam_fork(parent, with_blocks=True)
                g.add_seq(seq)
            new_beams.append((seq, tok, score, parent_slots[pi]))
        # drop live beams that were not selected (and unused spare slots)
        keep_ids = {s.seq_id for s, _, _, _ in new_beams}
        for b in beams:
            if b.seq_id not in keep_ids and not b.is_finished():
                bm.free(b)
                g.remove_seq(b.seq_id)
        # append the chosen tokens
        for seq, tok, score, slot in new_beams:
            lp_tok = score - seq.data.cumulative_logprob
            seq.append_token_id(tok, lp_tok)
            if sp.logprobs:
                # seq already carries tok; candidates decode against the
                # pre-append context
                seq.logprobs.append(self._build_logprob_dict(
                    seq, sp, topk_ids[slot], topk_lp[slot], tok,
                    lp_tok, context_ids=seq.get_token_ids()[:-1]))
            self._detokenize(seq, sp)

        # length bound: finalize with live beams added (HF finalize path)
        out_len = new_beams[0][0].get_output_len() if new_beams else 0
        new_len = new_beams[0][0].get_len() if new_beams else L + 1
        if (sp.max_tokens is not None and out_len >= sp.max_tokens) \
                or new_len >= self.max_model_len:
            self._beam_finalize(g, sp, [s for s, _, _, _ in new_beams],
                                add_running=True)

    def _beam_finalize(self, g, sp: SamplingParams,
                       live: List[Sequence], add_running: bool) -> None:
        """End the search: optionally promote live beams to hypotheses
        (HF finalize), keep the top-n by score, drop everything else."""
        bm = self.scheduler.block_manager
        hyps = self._beam_hyps(g)
        if add_running:
            for b in live:
                b.status = SequenceStatus.FINISHED_LENGTH_CAPPED
                hyps.append(b)
        else:
            for b in live:
                bm.free(b)
                g.remove_seq(b.seq_id)
        hyps.sort(key=lambda s: -self._beam_score(s, sp.length_penalty))
        for s in hyps[sp.n:]:
            bm.free(s)
            g.remove_seq(s.seq_id)
        del hyps[sp.n:]
        # order the group's seqs best-first for output
        g.seqs = [s for s in hyps]
        g.seqs_dict = {s.seq_id: s for s in g.seqs}
        g.beam_done = True

    def _process_prompt_logprobs(self, g, meta, chunk: int, start: int,
                                 execute_output) -> None:
        """Accumulate this prefill chunk's prompt logprobs onto the group.

        Row start+i holds the distribution at prompt position ctx+i; its
        entry describes the token at position ctx+i+1. Position 0 has no
        distribution → leading None (reference:
        processor/utils/single_step.py process_prompt_logprob).
        """
        data = next(iter(meta.seq_data.values()))
        ctx = data.get_num_computed_tokens()
        prompt = data.prompt_token_ids
        k = meta.sampling_params.prompt_logprobs
        chosen = np.asarray(execute_output.plp_chosen)
        topk_lp = (np.asarray(execute_output.plp_topk)
                   if execute_output.plp_topk is not None else None)
        topk_ids = (np.asarray(execute_output.plp_topk_ids)
                    if execute_output.plp_topk_ids is not None else None)
        if g.prompt_logprobs is None:
            g.prompt_logprobs = [None]
        detok = (meta.sampling_params.detokenize
                 and self.tokenizer is not None)
        for i in range(chunk):
            pos = ctx + i
            if pos + 1 >= len(prompt):
                break  # last prompt row predicts the first sampled token
            row = start + i
            target = prompt[pos + 1]
            d: Dict[int, Logprob] = {}
            if topk_ids is not None and k:
                d = {int(t): Logprob(float(p), rank=r + 1)
                     for r, (t, p) in enumerate(
                         zip(topk_ids[row][:k], topk_lp[row][:k]))}
            if target not in d:
                d[target] = Logprob(float(chosen[row]))
            else:
                d[target] = Logprob(float(chosen[row]),
                                    rank=d[target].rank)
            if detok:
                # Candidate token text per prompt position (reference:
                # tokenizer.py:45-118 decode_prompt_logprobs_inplace).
                for tid, lp in d.items():
                    lp.decoded_token = self.tokenizer.convert_tokens_to_string(
                        self.tokenizer.convert_ids_to_tokens([int(tid)]))
            g.prompt_logprobs.append(d)

    def _host_resample(self, seq: Sequence, sp: SamplingParams,
                       logits: np.ndarray):
        """Host-side sampling for rows with per-request logits_processors.

        Arbitrary Python callables can't run inside the jitted step, so the
        step returns these rows' raw (pre-penalty) logits and the host
        replays the sampler pipeline in the reference's order:
        logits_processors → penalties → min-tokens ban → temperature →
        top-k/top-p/min-p → sample (reference: backends/sampler.py:60-88
        _apply_logits_processors before _apply_penalties).
        """
        logits = np.array(logits, dtype=np.float32, copy=True)
        for fn in sp.logits_processors:
            logits = np.asarray(
                fn(list(seq.data.output_token_ids), logits),
                dtype=np.float32)
        V = logits.shape[0]
        out_ids = np.asarray(seq.data.output_token_ids, dtype=np.int64)
        if (sp.presence_penalty != 0 or sp.frequency_penalty != 0
                or sp.repetition_penalty != 1.0):
            out_counts = (np.bincount(out_ids[out_ids < V], minlength=V)
                          if out_ids.size else np.zeros(V, np.int64))
            out_mask = out_counts > 0
            prompt_ids = np.asarray(seq.data.prompt_token_ids,
                                    dtype=np.int64)
            seen = out_mask.copy()
            seen[prompt_ids[prompt_ids < V]] = True
            rp = sp.repetition_penalty
            logits = np.where(seen & (logits > 0), logits / rp,
                              np.where(seen, logits * rp, logits))
            logits = logits - sp.frequency_penalty * out_counts
            logits = logits - sp.presence_penalty * out_mask
        if seq.get_output_len() < sp.min_tokens:
            ban = list(sp.stop_token_ids)
            if not sp.ignore_eos and seq.eos_token_id is not None:
                ban.append(seq.eos_token_id)
            if ban:
                logits[np.asarray(ban, dtype=np.int64)] = -np.inf
        if sp.sampling_type.name == "GREEDY":
            token = int(np.argmax(logits))
            logz = logits - _logsumexp(logits)
            return token, float(logz[token])
        logits = logits / max(sp.temperature, 1e-5)
        if sp.top_k > 0 and sp.top_k < V:
            kth = np.partition(logits, -sp.top_k)[-sp.top_k]
            logits = np.where(logits < kth, -np.inf, logits)
        logz = logits - _logsumexp(logits)
        probs = np.exp(logz)
        if sp.top_p < 1.0:
            order = np.argsort(-probs)
            csum = np.cumsum(probs[order])
            cut = np.searchsorted(csum, sp.top_p) + 1
            mask = np.zeros(V, bool)
            mask[order[:cut]] = True
            probs = np.where(mask, probs, 0.0)
        if sp.min_p > 0.0:
            probs = np.where(probs < sp.min_p * probs.max(), 0.0, probs)
        probs = probs / probs.sum()
        rng = (np.random.default_rng((sp.seed, seq.get_output_len()))
               if sp.seed is not None else np.random.default_rng())
        token = int(rng.choice(V, p=probs))
        return token, float(logz[token])

    def _prime_detokenizer(self, seq: Sequence,
                           params: SamplingParams) -> None:
        """Initialize the incremental-detok window over the PROMPT only,
        so the first generated token emits its text as a delta (reference:
        tokenizer.py convert_prompt_ids_to_tokens priming). Priming over
        prompt+token would swallow the first token's text."""
        if seq.tokens is not None:
            return
        prompt_ids = seq.get_token_ids()[:seq.data.get_prompt_len()]
        (seq.tokens, _, seq.prefix_offset,
         seq.read_offset) = self.tokenizer.detokenize_incrementally(
             prompt_ids, None, 0, 0,
             skip_special_tokens=params.skip_special_tokens,
             spaces_between_special_tokens=(
                 params.spaces_between_special_tokens))

    def _detokenize(self, seq: Sequence, params: SamplingParams) -> str:
        if not params.detokenize or self.tokenizer is None:
            return ""
        self._prime_detokenizer(seq, params)
        (new_tokens, delta, seq.prefix_offset,
         seq.read_offset) = self.tokenizer.detokenize_incrementally(
             seq.get_token_ids(), seq.tokens, seq.prefix_offset,
             seq.read_offset,
             skip_special_tokens=params.skip_special_tokens,
             spaces_between_special_tokens=(
                 params.spaces_between_special_tokens))
        if seq.tokens is None:
            seq.tokens = new_tokens
        else:
            seq.tokens.extend(new_tokens)
        seq.output_text += delta
        return delta

    def _build_logprob_dict(self, seq: Sequence, params: SamplingParams,
                            ids_row, lp_row, chosen_token: int,
                            chosen_lp: float,
                            context_ids: Optional[List[int]] = None
                            ) -> Dict[int, Logprob]:
        """{token_id: Logprob} for one sampled position: the step's top-k
        candidates (rank = 1-based top-k order) + the chosen token, each
        carrying decoded_token = the text the candidate would append given
        the sequence's current detokenizer state (reference:
        core/processor/tokenizer.py:120-188 decode_sequence_inplace
        filling Logprob.decoded_token)."""
        k = params.logprobs
        d: Dict[int, Logprob] = {}
        for rank, (t, p) in enumerate(zip(ids_row[:k], lp_row[:k])):
            d[int(t)] = Logprob(float(p), rank=rank + 1)
        if chosen_token not in d:
            d[chosen_token] = Logprob(chosen_lp)
        if params.detokenize and self.tokenizer is not None:
            self._prime_detokenizer(seq, params)
            ctx = list(context_ids if context_ids is not None
                       else seq.get_token_ids())
            for tid, lp in d.items():
                _, text, _, _ = self.tokenizer.detokenize_incrementally(
                    ctx + [tid], seq.tokens, seq.prefix_offset,
                    seq.read_offset,
                    skip_special_tokens=params.skip_special_tokens,
                    spaces_between_special_tokens=(
                        params.spaces_between_special_tokens))
                lp.decoded_token = text
        return d

    def _to_request_output(self, g) -> RequestOutput:
        sp = g.sampling_params
        seqs = g.get_seqs()
        if len(seqs) > 1:
            if sp.use_beam_search:
                seqs = sorted(seqs, key=lambda s: -self._beam_score(
                    s, sp.length_penalty))[:sp.n]
            elif sp.best_of > sp.n:
                # best_of parallel samples, top-n by cumulative logprob
                # (reference: decoding/schema/engine_io.py:159-171
                # from_seq_group top-n selection).
                seqs = sorted(
                    seqs,
                    key=lambda s: -s.data.cumulative_logprob)[:sp.n]
        completions = []
        for i, seq in enumerate(seqs):
            completions.append(CompletionOutput(
                index=i,
                text=seq.output_text,
                token_ids=list(seq.data.output_token_ids),
                cumulative_logprob=seq.data.cumulative_logprob,
                logprobs=seq.logprobs or None,
                finish_reason=SequenceStatus.get_finished_reason(seq.status),
                stop_reason=seq.stop_reason))
        finished = g.is_finished()
        if finished and g.metrics.finished_time is None:
            import time

            g.metrics.finished_time = time.time()
        return RequestOutput(
            request_id=g.request_id, finished=finished, prompt=g.prompt,
            prompt_token_ids=g.prompt_token_ids, outputs=completions,
            prompt_logprobs=g.prompt_logprobs, metrics=g.metrics)
