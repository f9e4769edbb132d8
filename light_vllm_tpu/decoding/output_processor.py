"""Decoding output processing: pythonize device samples, append tokens,
incremental detokenization, stop checking.

(reference: light_vllm/decoding/processor/output_processor.py:14-105,
processor/utils/single_step.py:15, processor/utils/stop_checker.py:8)
"""

from typing import List, Optional

import numpy as np

from light_vllm_tpu.core.processor.output_processor import OutputProcessor
from light_vllm_tpu.core.schema.engine_io import (CompletionOutput,
                                                  RequestOutput)
from light_vllm_tpu.decoding.sampling_params import SamplingParams
from light_vllm_tpu.decoding.schema import (DecodingExecuteOutput,
                                            DecodingSchedulerOutput,
                                            Sequence, SequenceStatus)
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


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

    def __init__(self, tokenizer, max_model_len: int) -> None:
        self.tokenizer = tokenizer
        self.stop_checker = StopChecker(max_model_len)

    @classmethod
    def from_engine(cls, engine) -> "DecodingOutputProcessor":
        return cls(engine.tokenizer,
                   engine.engine_config.model_config.max_model_len)

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
            for sched, meta, slots, chunks in zip(
                    scheduler_output.scheduled_seq_groups, metas,
                    scheduler_output.sample_slots,
                    scheduler_output.sample_chunks):
                g = sched.seq_group
                for seq_id, slot, chunk in zip(meta.seq_data, slots, chunks):
                    seq = g.seqs_dict[seq_id]
                    for step_idx, (tokens_t, lp_t) in enumerate(sub_steps):
                        if seq.is_finished():
                            break
                        token = int(tokens_t[slot])
                        lp = float(lp_t[slot]) if lp_t is not None else 0.0
                        if (topk_lp is not None and meta.do_sample
                                and meta.sampling_params.logprobs):
                            k = meta.sampling_params.logprobs
                            d = {int(t): float(p) for t, p in
                                 zip(topk_ids[slot][:k], topk_lp[slot][:k])}
                            d.setdefault(token, lp)
                            seq.logprobs.append(d)
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

    def _detokenize(self, seq: Sequence, params: SamplingParams) -> str:
        if not params.detokenize or self.tokenizer is None:
            return ""
        (new_tokens, delta, seq.prefix_offset,
         seq.read_offset) = self.tokenizer.detokenize_incrementally(
             seq.get_token_ids(), seq.tokens, seq.prefix_offset,
             seq.read_offset,
             skip_special_tokens=params.skip_special_tokens)
        if seq.tokens is None:
            seq.tokens = new_tokens
        else:
            seq.tokens.extend(new_tokens)
        seq.output_text += delta
        return delta

    def _to_request_output(self, g) -> RequestOutput:
        completions = []
        for i, seq in enumerate(g.get_seqs()):
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
            metrics=g.metrics)
