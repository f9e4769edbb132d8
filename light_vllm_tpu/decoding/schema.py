"""Sequence state machine + decoding IO schemas.

Counterpart of the reference's sequence module (reference:
light_vllm/decoding/schema/sequence.py:37-643) and decoding execute IO
(reference: light_vllm/decoding/schema/execute_io.py). Host-side state is
plain Python/numpy; device-side results live in DecodingExecuteOutput as jnp
arrays until the output processor pythonizes them.
"""

import enum
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Set, Tuple

import numpy as np

from light_vllm_tpu.core.schema.engine_io import (Request, RequestMetrics,
                                                  SchedulableRequest,
                                                  SchedulerOutput,
                                                  TextOnlyInputs)
from light_vllm_tpu.core.schema.execute_io import (ExecuteOutput, ModelInput,
                                                   WorkerInput)
from light_vllm_tpu.decoding.sampling_params import SamplingParams


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    SWAPPED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()
    FINISHED_IGNORED = enum.auto()

    @staticmethod
    def is_finished(status: "SequenceStatus") -> bool:
        return status in (SequenceStatus.FINISHED_STOPPED,
                          SequenceStatus.FINISHED_LENGTH_CAPPED,
                          SequenceStatus.FINISHED_ABORTED,
                          SequenceStatus.FINISHED_IGNORED)

    @staticmethod
    def get_finished_reason(status: "SequenceStatus") -> Optional[str]:
        return {
            SequenceStatus.FINISHED_STOPPED: "stop",
            SequenceStatus.FINISHED_LENGTH_CAPPED: "length",
            SequenceStatus.FINISHED_ABORTED: "abort",
            SequenceStatus.FINISHED_IGNORED: "length",
        }.get(status)


class SequenceStage(enum.Enum):
    PREFILL = enum.auto()
    DECODE = enum.auto()


class SequenceData:
    """Prompt + output token bookkeeping with chunked-prefill progress
    (reference: sequence.py:95 — num_computed_tokens / stage)."""

    def __init__(self, prompt_token_ids: List[int]) -> None:
        self.prompt_token_ids = list(prompt_token_ids)
        self.output_token_ids: List[int] = []
        self.cumulative_logprob = 0.0
        self._num_computed_tokens = 0
        self.stage = SequenceStage.PREFILL

    def get_len(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    def get_prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    def get_output_len(self) -> int:
        return len(self.output_token_ids)

    def get_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    def get_last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return self.prompt_token_ids[-1]

    def append_token_id(self, token_id: int, logprob: float = 0.0) -> None:
        self.output_token_ids.append(int(token_id))
        self.cumulative_logprob += logprob

    def get_num_computed_tokens(self) -> int:
        return self._num_computed_tokens

    def update_num_computed_tokens(self, num: int) -> None:
        self._num_computed_tokens += num
        if self.get_num_uncomputed_tokens() == 0:
            self.stage = SequenceStage.DECODE

    def get_num_uncomputed_tokens(self) -> int:
        # During decode this is 1 (the freshly appended token).
        return self.get_len() - self._num_computed_tokens

    def reset_state_for_recompute(self) -> None:
        self._num_computed_tokens = 0
        self.stage = SequenceStage.PREFILL


class Sequence:
    """One generation branch of a request (reference: sequence.py:247)."""

    def __init__(self, seq_id: int, prompt_token_ids: List[int],
                 block_size: int, eos_token_id: Optional[int] = None,
                 prompt: Optional[str] = None) -> None:
        self.seq_id = seq_id
        self.prompt = prompt
        self.block_size = block_size
        self.eos_token_id = eos_token_id
        self.data = SequenceData(prompt_token_ids)
        self.status = SequenceStatus.WAITING
        self.stop_reason: Optional[Any] = None
        # incremental detokenization state
        self.output_text = ""
        self.tokens: Optional[List[str]] = None
        self.prefix_offset = 0
        self.read_offset = 0
        self.logprobs: List[Dict[int, float]] = []

    def get_len(self) -> int:
        return self.data.get_len()

    def get_token_ids(self) -> List[int]:
        return self.data.get_token_ids()

    def get_output_len(self) -> int:
        return self.data.get_output_len()

    def get_last_token_id(self) -> int:
        return self.data.get_last_token_id()

    def append_token_id(self, token_id: int, logprob: float = 0.0) -> None:
        self.data.append_token_id(token_id, logprob)

    def is_finished(self) -> bool:
        return SequenceStatus.is_finished(self.status)

    def is_prefill(self) -> bool:
        return self.data.stage == SequenceStage.PREFILL

    def num_logical_blocks(self) -> int:
        return -(-self.get_len() // self.block_size)

    def hash_of_block(self, logical_idx: int) -> int:
        """Content hash covering tokens [0 .. (logical_idx+1)*block_size)
        (reference: sequence.py:300) — prefix-caching key."""
        num_tokens = (logical_idx + 1) * self.block_size
        return hash(tuple(self.get_token_ids()[:num_tokens]))

    def num_hashed_tokens_of_block(self, logical_idx: int) -> int:
        return (logical_idx + 1) * self.block_size

    def fork(self, new_seq_id: int) -> "Sequence":
        import copy

        new_seq = Sequence(new_seq_id, [], self.block_size,
                           self.eos_token_id, self.prompt)
        new_seq.data = copy.deepcopy(self.data)
        new_seq.status = self.status
        new_seq.output_text = self.output_text
        new_seq.tokens = list(self.tokens) if self.tokens else None
        new_seq.prefix_offset = self.prefix_offset
        new_seq.read_offset = self.read_offset
        new_seq.logprobs = list(self.logprobs)
        return new_seq

    def get_num_new_tokens(self) -> int:
        if self.data.stage == SequenceStage.DECODE:
            return 1
        return self.data.get_num_uncomputed_tokens()


class SequenceGroup(SchedulableRequest):
    """All sequences of one request (n>1 forks share the prompt)
    (reference: sequence.py:397)."""

    def __init__(self, request_id: str, seqs: List[Sequence],
                 sampling_params: SamplingParams, arrival_time: float,
                 metrics: Optional[RequestMetrics] = None) -> None:
        super().__init__(request_id=request_id, arrival_time=arrival_time,
                         metrics=metrics or RequestMetrics(
                             arrival_time=arrival_time))
        self.seqs = seqs
        self.seqs_dict = {s.seq_id: s for s in seqs}
        self.sampling_params = sampling_params
        self.prompt_token_ids = seqs[0].data.prompt_token_ids
        self.prompt = seqs[0].prompt
        # Per-position prompt logprobs, accumulated across prefill chunks
        # ([None] + one {token: lp} dict per position 1..len-1; reference:
        # sequence.py:435 SequenceGroup.prompt_logprobs).
        self.prompt_logprobs: Optional[List[Optional[Dict[int,
                                                          float]]]] = None
        # Async-scheduling guard: True while a batch containing this group
        # is in flight (reference: decoding/scheduler.py busy flag :874).
        self.busy = False

    def get_seqs(self, status: Optional[SequenceStatus] = None
                 ) -> List[Sequence]:
        if status is None:
            return list(self.seqs)
        return [s for s in self.seqs if s.status == status]

    def num_seqs(self, status: Optional[SequenceStatus] = None) -> int:
        return len(self.get_seqs(status))

    def num_unfinished_seqs(self) -> int:
        return len([s for s in self.seqs if not s.is_finished()])

    def is_finished(self) -> bool:
        return all(s.is_finished() for s in self.seqs)

    def is_prefill(self) -> bool:
        return self.seqs[0].is_prefill()

    def add_seq(self, seq: Sequence) -> None:
        if seq.seq_id in self.seqs_dict:
            raise ValueError(f"duplicate seq id {seq.seq_id}")
        self.seqs.append(seq)
        self.seqs_dict[seq.seq_id] = seq

    def remove_seq(self, seq_id: int) -> None:
        self.seqs_dict.pop(seq_id)
        self.seqs = [s for s in self.seqs if s.seq_id != seq_id]

    def get_max_num_running_seqs(self) -> int:
        if self.sampling_params.best_of > 1 and self.is_prefill():
            return self.sampling_params.best_of
        return self.num_unfinished_seqs()

    def num_new_tokens(self) -> int:
        return sum(s.get_num_new_tokens() for s in self.seqs
                   if not s.is_finished())


@dataclass
class ScheduledSequenceGroup:
    seq_group: SequenceGroup
    # tokens to compute this step (< full for chunked prefill;
    # reference: scheduler.py token_chunk_size)
    token_chunk_size: int = 0


@dataclass
class DecodingSchedulerOutput(SchedulerOutput):
    scheduled_seq_groups: List[ScheduledSequenceGroup] = field(
        default_factory=list)
    num_prefill_groups: int = 0
    num_batched_tokens: int = 0
    blocks_to_swap_in: List[Tuple[int, int]] = field(default_factory=list)
    blocks_to_swap_out: List[Tuple[int, int]] = field(default_factory=list)
    blocks_to_copy: List[Tuple[int, int]] = field(default_factory=list)
    ignored_seq_groups: List[SequenceGroup] = field(default_factory=list)
    preempted: int = 0
    # K > 1: the device runs K chained decode iterations in one dispatch
    # (multi-step decode); outputs come back as a [K, 2, S] ring.
    multi_step: int = 1
    # Filled by the scheduler at schedule() time so the input builder does
    # not re-walk sequence state (metadata snapshot).
    seq_group_metadata_list: List["SequenceGroupMetadata"] = field(
        default_factory=list)
    # Filled by the input builder: seq slot and per-seq token chunk of each
    # (meta, seq) in iteration order, so the output processor can map
    # sampled tokens back and advance computed counts per sequence.
    sample_slots: List[List[int]] = field(default_factory=list)
    sample_chunks: List[List[int]] = field(default_factory=list)
    # flat token row where each (meta, seq)'s chunk starts (prompt-logprob
    # rows live at [start, start+chunk))
    sample_starts: List[List[int]] = field(default_factory=list)
    # seq slot → row index into ExecuteOutput.lp_logits (host-side
    # logits_processors path)
    lp_slot_map: Dict[int, int] = field(default_factory=dict)

    def is_empty(self) -> bool:
        return (not self.scheduled_seq_groups
                and not self.blocks_to_swap_in
                and not self.blocks_to_swap_out
                and not self.blocks_to_copy
                and not self.ignored_seq_groups)


@dataclass
class SequenceGroupMetadata:
    """Immutable-ish snapshot handed to the input builder
    (reference: sequence.py:577)."""

    request_id: str
    is_prompt: bool
    seq_data: Dict[int, SequenceData]
    sampling_params: SamplingParams
    block_tables: Dict[int, List[int]]
    do_sample: bool = True
    token_chunk_size: int = 0
    computed_block_nums: Optional[List[int]] = None
    eos_token_id: Optional[int] = None  # for the min_tokens sampler ban


# --- execute IO -----------------------------------------------------------
@dataclass
class DecodingModelInput(ModelInput):
    """Flattened ragged batch (decodes + prefills) padded to buckets.

    Layout contract (what the Pallas kernels assume):
      - token rows [0, num_decode_tokens): one decode token per seq, and
        token row i belongs to seq slot i;
      - rows [num_decode_tokens, decode_region): padding;
      - each prefill chunk starts at a TILE_Q(=128)-aligned row ≥
        decode_region; prefill seq k occupies seq slot decode_region + k.
    Padded tokens carry seq_ids → a slot whose seq_len is 0 and
    slot_mapping → the null page 0.

    Shapes: tokens T (bucketed), seqs S (bucketed pow2), pages =
    max_model_len/page_size, NT prefill tiles (bucketed).

    Small per-step arrays are PACKED into three matrices so one engine step
    costs a handful of host→device transfers instead of ~17 (transfer
    latency, not bandwidth, dominates small buffers):

      tok_i32 [4, T]: input_ids, positions, slot_mapping, seq_ids
      seq_i32 [7, S]: seq_lens, ctx_lens, chunk_starts, chunk_lens,
                      logits_indices, top_k, seeds(int32-bitcast)
      seq_f32 [6, S]: temperature, top_p, min_p, presence, frequency,
                      repetition
      tiles   [2, NT]: tile_seq, tile_qstart
    """

    blob: np.ndarray = None          # [total] i32 — ALL of the above packed
    # static dims for unpacking (part of the jit cache key):
    T: int = 0
    S: int = 0
    NT: int = 0
    P: int = 0                       # max pages per seq
    max_out: int = 0
    has_prompt_tokens: bool = False
    prompt_len: int = 0
    ban_len: int = 0                 # min_tokens stop-token ban width (0=off)
    # prompt_logprobs: a [T] target-id row rides at the blob tail and the
    # step computes per-position prompt logprobs (chunked over T).
    has_plp: bool = False
    plp_k: int = 0                   # top-k width for prompt logprobs
    # rows with per-request logits_processors: the step returns their raw
    # [lp_width, V] logits for the host-side resample path (0 = none)
    lp_width: int = 0
    # host-only metadata (not transferred):
    num_seqs: int = 0
    num_decode_tokens: int = 0       # real decode tokens
    decode_region: int = 0           # padded decode region (kernel slice)
    num_prefill_seqs: int = 0
    num_logprobs: int = 0            # max logprobs requested in this batch
    use_penalties: bool = False
    use_topkp: bool = False
    all_greedy: bool = False
    multi_step: int = 1              # K chained decode iterations
    # Deferred-output decode chaining: when set, the worker replaces the
    # blob's input-token row [0:S] with the previous multi-step
    # invocation's last device-side sampled tokens (the blob carries
    # host placeholders). chain_key identifies the (row -> sequence)
    # assignment; the engine only sets chain_tokens when it matches the
    # previously dispatched window.
    chain_tokens: bool = False
    chain_key: Optional[Tuple] = None


@dataclass
class SamplingTensors:
    """Per-seq-slot sampling controls, padded to the seq bucket."""

    temperature: np.ndarray = None      # [S] f32; 0 => greedy
    top_p: np.ndarray = None            # [S] f32
    top_k: np.ndarray = None            # [S] i32; 0 => off
    min_p: np.ndarray = None            # [S] f32
    presence_penalty: np.ndarray = None  # [S] f32
    frequency_penalty: np.ndarray = None  # [S] f32
    repetition_penalty: np.ndarray = None  # [S] f32
    # token-id histogram tensors for penalties, [S, vocab] would be too big;
    # we pass output token ids padded [S, max_out] + prompt ids [S, max_in]
    output_tokens: Optional[np.ndarray] = None
    prompt_tokens: Optional[np.ndarray] = None
    seeds: Optional[np.ndarray] = None  # [S] u32 per-step seeds

    def to_device(self):
        import jax

        return SamplingTensors(**{
            k: (jax.device_put(v) if isinstance(v, np.ndarray) else v)
            for k, v in self.__dict__.items()})


@dataclass
class DecodingWorkerInput(WorkerInput):
    blocks_to_swap_in: List[Tuple[int, int]] = field(default_factory=list)
    blocks_to_swap_out: List[Tuple[int, int]] = field(default_factory=list)
    blocks_to_copy: List[Tuple[int, int]] = field(default_factory=list)


@dataclass
class DecodingExecuteOutput(ExecuteOutput):
    """Device arrays: sampled tokens packed with chosen logprobs as one
    [2, S] i32 buffer (row 1 is bitcast f32) + optional top-k logprobs."""

    next_tokens: Any = None        # [2, S] i32 packed, or [S] i32
    logprobs: Any = None           # [S, k] f32 (optional)
    logprob_token_ids: Any = None  # [S, k] i32 (optional)
    chosen_logprobs: Any = None    # [S] f32 (when not packed)
    plp_chosen: Any = None         # [T] f32 prompt-token logprob per row
    plp_topk: Any = None           # [T, k] f32 (optional)
    plp_topk_ids: Any = None       # [T, k] i32 (optional)
    lp_logits: Any = None          # [lp_width, V] f32 raw logits rows

    def pythonize(self):
        import numpy as np

        raw = np.asarray(self.next_tokens)
        if raw.ndim == 2:
            tokens = raw[0]
            chosen = raw[1].view(np.float32)
        else:
            tokens = raw
            chosen = np.asarray(self.chosen_logprobs) \
                if self.chosen_logprobs is not None else None
        lp = np.asarray(self.logprobs) if self.logprobs is not None else None
        lp_ids = np.asarray(self.logprob_token_ids) \
            if self.logprob_token_ids is not None else None
        return tokens, chosen, lp, lp_ids
