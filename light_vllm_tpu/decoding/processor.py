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

# Token-bucket ladder: fine-grained at small sizes (decode-heavy steps),
# power-of-two growth beyond.
_DEFAULT_TOKEN_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def pick_token_bucket(n: int, buckets=_DEFAULT_TOKEN_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return next_power_of_2(n)


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
        if params.n != 1:
            raise NotImplementedError(
                "n>1 sampling lands with sequence forking; use n=1")
        eos = self.tokenizer.eos_token_id
        seq = Sequence(next(self.seq_counter), inputs.prompt_token_ids,
                       self.block_size, eos_token_id=eos,
                       prompt=inputs.prompt)
        return SequenceGroup(request_id=request.request_id, seqs=[seq],
                             sampling_params=params,
                             arrival_time=request.arrival_time,
                             metrics=request.metrics)


class DecodingModelInputBuilder(ModelInputBuilder):

    def __init__(self, block_size: int, max_model_len: int,
                 max_num_seqs: int, vocab_size: int) -> None:
        self.block_size = block_size
        self.max_model_len = max_model_len
        self.max_num_seqs = max_num_seqs
        self.max_pages = cdiv(max_model_len, block_size)
        self.vocab_size = vocab_size

    @classmethod
    def from_engine(cls, engine) -> "DecodingModelInputBuilder":
        cc = engine.engine_config.cache_config
        mc = engine.engine_config.model_config
        sc = engine.engine_config.scheduler_config
        return cls(cc.block_size, mc.max_model_len, sc.max_num_seqs,
                   mc.get_vocab_size())

    def __call__(self, scheduler_output: DecodingSchedulerOutput
                 ) -> ExecuteInput:
        metas = scheduler_output.seq_group_metadata_list
        tokens: List[int] = []
        positions: List[int] = []
        slots: List[int] = []
        seq_rows: List[dict] = []  # one per (seq slot)

        for meta in metas:
            for seq_id, data in meta.seq_data.items():
                n_computed = data.get_num_computed_tokens()
                if meta.is_prompt:
                    chunk = meta.token_chunk_size
                else:
                    chunk = 1
                all_ids = data.get_token_ids()
                new_ids = all_ids[n_computed:n_computed + chunk]
                block_table = meta.block_tables[seq_id]
                row = {
                    "query_len": len(new_ids),
                    "kv_len": n_computed + len(new_ids),
                    "block_table": block_table,
                    "meta": meta,
                    "data": data,
                    "do_sample": meta.do_sample,
                }
                seq_rows.append(row)
                for i, tok in enumerate(new_ids):
                    pos = n_computed + i
                    tokens.append(tok)
                    positions.append(pos)
                    block = block_table[pos // self.block_size]
                    slots.append(block * self.block_size
                                 + pos % self.block_size)

        T_real, S_real = len(tokens), len(seq_rows)
        T = pick_token_bucket(max(T_real, 1))
        S = min(next_power_of_2(max(S_real, 1)),
                max(next_power_of_2(self.max_num_seqs), 1))
        if S < S_real:
            S = next_power_of_2(S_real)

        input_ids = np.zeros(T, dtype=np.int32)
        input_ids[:T_real] = tokens
        pos_arr = np.zeros(T, dtype=np.int32)
        pos_arr[:T_real] = positions
        slot_arr = np.zeros(T, dtype=np.int32)  # pad slots → trash page 0
        slot_arr[:T_real] = slots

        block_tables = np.zeros((S, self.max_pages), dtype=np.int32)
        seq_lens = np.zeros(S, dtype=np.int32)
        query_start = np.zeros(S + 1, dtype=np.int32)
        logits_idx = np.zeros(S, dtype=np.int32)
        off = 0
        for i, row in enumerate(seq_rows):
            bt = row["block_table"]
            block_tables[i, :len(bt)] = bt
            seq_lens[i] = row["kv_len"]
            query_start[i + 1] = query_start[i] + row["query_len"]
            off += row["query_len"]
            logits_idx[i] = off - 1  # last token of this seq's chunk
        query_start[S_real + 1:] = query_start[S_real]
        # padded seq slots: point logits gather at token 0 (harmless)

        sampling = self._build_sampling(seq_rows, S)

        model_input = DecodingModelInput(
            input_ids=input_ids, positions=pos_arr, slot_mapping=slot_arr,
            block_tables=block_tables, seq_lens=seq_lens,
            query_start_loc=query_start, logits_indices=logits_idx,
            num_seqs=np.array(S_real, dtype=np.int32), sampling=sampling)
        worker_input = DecodingWorkerInput(
            blocks_to_swap_in=scheduler_output.blocks_to_swap_in,
            blocks_to_swap_out=scheduler_output.blocks_to_swap_out,
            blocks_to_copy=scheduler_output.blocks_to_copy)
        return ExecuteInput(worker_input=worker_input,
                            model_input=model_input)

    def _build_sampling(self, seq_rows: List[dict], S: int
                        ) -> SamplingTensors:
        temperature = np.zeros(S, dtype=np.float32)
        top_p = np.ones(S, dtype=np.float32)
        top_k = np.zeros(S, dtype=np.int32)
        min_p = np.zeros(S, dtype=np.float32)
        presence = np.zeros(S, dtype=np.float32)
        frequency = np.zeros(S, dtype=np.float32)
        repetition = np.ones(S, dtype=np.float32)
        seeds = np.zeros(S, dtype=np.uint32)
        max_out = max([len(r["data"].output_token_ids)
                       for r in seq_rows] + [1])
        max_out = next_power_of_2(max_out)
        # output-token matrix for penalty computation; vocab_size = "none"
        out_tokens = np.full((S, max_out), self.vocab_size, dtype=np.int32)
        needs_prompt = any(
            r["meta"].sampling_params.presence_penalty != 0
            or r["meta"].sampling_params.frequency_penalty != 0
            or r["meta"].sampling_params.repetition_penalty != 1.0
            for r in seq_rows)
        prompt_tokens = None
        if needs_prompt:
            max_in = next_power_of_2(max(
                [len(r["data"].prompt_token_ids) for r in seq_rows] + [1]))
            prompt_tokens = np.full((S, max_in), self.vocab_size,
                                    dtype=np.int32)
        rng = np.random.default_rng()
        for i, row in enumerate(seq_rows):
            sp: SamplingParams = row["meta"].sampling_params
            temperature[i] = sp.temperature
            top_p[i] = sp.top_p
            top_k[i] = sp.top_k if sp.top_k > 0 else 0
            min_p[i] = sp.min_p
            presence[i] = sp.presence_penalty
            frequency[i] = sp.frequency_penalty
            repetition[i] = sp.repetition_penalty
            if sp.seed is not None:
                # per-step deterministic stream: seed + step index
                seeds[i] = (sp.seed + 0x9E3779B9
                            * len(row["data"].output_token_ids)) & 0xFFFFFFFF
            else:
                seeds[i] = rng.integers(0, 2**32, dtype=np.uint32)
            outs = row["data"].output_token_ids
            out_tokens[i, :len(outs)] = outs[:max_out]
            if prompt_tokens is not None:
                ins = row["data"].prompt_token_ids
                prompt_tokens[i, :len(ins)] = ins[:prompt_tokens.shape[1]]
        return SamplingTensors(
            temperature=temperature, top_p=top_p, top_k=top_k, min_p=min_p,
            presence_penalty=presence, frequency_penalty=frequency,
            repetition_penalty=repetition, output_tokens=out_tokens,
            prompt_tokens=prompt_tokens, seeds=seeds)
