"""Continuous-batching scheduler for decoding workloads.

Counterpart of the reference's DecodingScheduler (reference:
light_vllm/decoding/scheduler.py:43-1133): WAITING/RUNNING/SWAPPED deques, a
(token, seq) budget per step, chunked prefill, preemption by RECOMPUTE
(single-seq groups) or SWAP (multi-seq), lazy request→SequenceGroup
conversion, and the `busy` flag that keeps async in-flight groups from being
rescheduled.

Policies:
  - default (prefill-priority): admit whole prompts first, then decodes
    (reference: _schedule_default:663);
  - chunked (decode-priority): decodes first, then swapped, then prompt
    chunks fill the remaining token budget (reference:
    _schedule_chunked_prefill:742).
"""

import random
from collections import deque
from typing import Deque, List, Optional, Set, Tuple

from light_vllm_tpu import envs
from light_vllm_tpu.core.scheduler import Scheduler
from light_vllm_tpu.decoding.block_manager import (AllocStatus,
                                                   BlockSpaceManager)
from light_vllm_tpu.decoding.schema import (DecodingSchedulerOutput,
                                            ScheduledSequenceGroup,
                                            SequenceGroup,
                                            SequenceGroupMetadata,
                                            SequenceStatus)
from light_vllm_tpu.logger import init_logger
from light_vllm_tpu.utils import cdiv

logger = init_logger(__name__)

ARTIFICIAL_PREEMPTION_PROB = 0.5


class PreemptionMode:
    SWAP = "swap"
    RECOMPUTE = "recompute"


class DecodingSchedulingBudget:
    """Per-step token + seq budget (reference: scheduler.py:43-100).

    With tile accounting enabled (chunked prefill), the budget also tracks
    the TILE-ALIGNED token region the ModelInputBuilder will actually
    materialize: the decode region rounds up to a TILE_Q multiple and every
    prefill chunk occupies ceil(chunk/TILE_Q) query tiles. Charging aligned
    costs keeps the builder's padded token count inside ONE bucket, so the
    steady-state mixed batch always hits the same compiled executable
    instead of walking the bucket ladder (each new (T, S) shape is a full
    XLA recompile — this was measured to dominate chunked-mode serving)."""

    def __init__(self, token_budget: int, max_num_seqs: int,
                 tile: int = 0, tile_cap: int = 0,
                 reserve_decode: bool = True) -> None:
        self.token_budget = token_budget
        self.max_num_seqs = max_num_seqs
        self.num_batched_tokens = 0
        self.num_curr_seqs = 0
        # Reserve the (worst-case) decode region upfront: decode rows are
        # capped by max_num_seqs, so the reservation is deterministic and
        # admission order-independent. Prefill-priority scheduling never
        # mixes decodes into a prefill step, so it passes
        # reserve_decode=False and prompts may fill the whole tile cap.
        reserve = cdiv(max_num_seqs, tile) * tile \
            if (tile and reserve_decode) else 0
        if not tile or not tile_cap or reserve + tile > tile_cap:
            tile_cap = 0  # tile accounting disabled / infeasible
            tile = 0  # chunks must not tile-align either (raw budgeting)
        self.tile = tile
        self.tile_cap = tile_cap
        self._decode_reserve = reserve if tile_cap else 0
        self.num_tile_tokens = 0  # aligned prefill tokens admitted

    def can_schedule(self, *, num_new_tokens: int, num_new_seqs: int,
                     prefill: bool = False) -> bool:
        assert num_new_tokens >= 0 and num_new_seqs >= 0
        if num_new_tokens == 0:
            return False
        ok = (self.num_batched_tokens + num_new_tokens <= self.token_budget
              and self.num_curr_seqs + num_new_seqs <= self.max_num_seqs)
        if ok and prefill and self.tile_cap:
            # Whole-prompt admission must also fit the tile-aligned region
            # (chunked admission pre-aligns via remaining_chunk_allowance).
            aligned = cdiv(num_new_tokens, self.tile) * self.tile
            ok = (self._decode_reserve + self.num_tile_tokens + aligned
                  <= self.tile_cap)
        return ok

    def remaining_token_budget(self) -> int:
        return self.token_budget - self.num_batched_tokens

    def remaining_chunk_allowance(self) -> int:
        """Largest admissible prefill chunk under both the raw token budget
        and the tile-aligned region cap."""
        raw = self.remaining_token_budget()
        if not self.tile_cap:
            return raw
        tile_room = (self.tile_cap - self._decode_reserve
                     - self.num_tile_tokens)
        return min(raw, max(tile_room, 0))

    def add(self, num_new_tokens: int, num_new_seqs: int,
            prefill_chunk: bool = False) -> None:
        self.num_batched_tokens += num_new_tokens
        self.num_curr_seqs += num_new_seqs
        if prefill_chunk and self.tile_cap:
            self.num_tile_tokens += cdiv(num_new_tokens,
                                         self.tile) * self.tile


class DecodingScheduler(Scheduler):

    support_scheduling = ["sync_scheduling", "async_scheduling"]

    def __init__(self, scheduler_config, cache_config, request_processor
                 ) -> None:
        super().__init__(scheduler_config, request_processor)
        self.cache_config = cache_config
        self.block_manager = BlockSpaceManager(
            block_size=cache_config.block_size,
            num_device_blocks=cache_config.num_device_blocks,
            num_cpu_blocks=cache_config.num_cpu_blocks or 0,
            enable_prefix_caching=cache_config.enable_prefix_caching,
            sliding_window=cache_config.sliding_window)
        self.running: Deque[SequenceGroup] = deque()
        self.swapped: Deque[SequenceGroup] = deque()
        self.user_specified_preemption_mode = \
            scheduler_config.preemption_mode
        self.num_scheduler_steps = getattr(scheduler_config,
                                           "num_scheduler_steps", 1)
        if cache_config.sliding_window:
            self.num_scheduler_steps = 1  # rotation is per-token host work
        self.num_cumulative_preemption = 0
        self.artificial_preempt = bool(
            envs.LVT_TEST_ENABLE_ARTIFICIAL_PREEMPT)
        from light_vllm_tpu.decoding.processor import static_shapes_enabled
        self._static_shapes = static_shapes_enabled()

    @classmethod
    def from_engine(cls, engine) -> "DecodingScheduler":
        worker = getattr(engine.executor, "worker", None)
        if worker is not None and getattr(worker, "in_engine_dp", 1) > 1:
            # In-engine DP: one sub-scheduler per dp partition, each
            # owning a disjoint KV page shard (decoding/dp_scheduler.py).
            from light_vllm_tpu.decoding.dp_scheduler import \
                DataParallelDecodingScheduler
            return DataParallelDecodingScheduler.from_engine(engine)
        return cls(engine.engine_config.scheduler_config,
                   engine.engine_config.cache_config,
                   engine.request_processor)

    # ------------------------------------------------------------------ api
    def schedule(self) -> DecodingSchedulerOutput:
        chunked = self.scheduler_config.enable_chunked_prefill
        if chunked or self._static_shapes:
            # Tile-aware budget: keep the builder's padded token region in
            # one bucket (see DecodingSchedulingBudget docstring). Static-
            # shape mode needs the same accounting in default scheduling so
            # every prefill step lands in the precompiled T bucket.
            from light_vllm_tpu.decoding.processor import (
                DecodingModelInputBuilder, static_prefill_token_bucket)
            tile = DecodingModelInputBuilder.TILE_Q
            tile_cap = static_prefill_token_bucket(
                self.scheduler_config.max_num_batched_tokens, chunked)
            budget = DecodingSchedulingBudget(
                self.scheduler_config.max_num_batched_tokens,
                self.scheduler_config.max_num_seqs,
                tile=tile, tile_cap=tile_cap,
                reserve_decode=chunked)
        else:
            budget = DecodingSchedulingBudget(
                self.scheduler_config.max_num_batched_tokens,
                self.scheduler_config.max_num_seqs)
        # Seed with already-live sequences so prompt admission respects
        # max_num_seqs across steps, not per schedule() call (reference:
        # vLLM budget semantics — max_num_seqs caps CONCURRENT seqs; without
        # this the running set grows unboundedly and every new high-water
        # mark compiles a fresh decode executable).
        budget.num_curr_seqs = sum(
            g.num_seqs(SequenceStatus.RUNNING) for g in self.running)
        if self.scheduler_config.enable_chunked_prefill:
            out = self._schedule_chunked(budget)
        else:
            out = self._schedule_default(budget)
        self._build_metadata(out)
        return out

    def has_unfinished_requests(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def get_num_unfinished_requests(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    # -------------------------------------------------------------- helpers
    def _convert_waiting_head(self) -> Optional[SequenceGroup]:
        """Lazily tokenize the head of the waiting queue
        (reference: scheduler.py:589-592)."""
        while self.waiting:
            head = self.waiting[0]
            if head.request_id in self.aborted_requests:
                self.waiting.popleft()
                self.requests.discard(head.request_id)
                self.aborted_requests.discard(head.request_id)
                continue
            if not isinstance(head, SequenceGroup):
                head = self.request_processor(head)
                self.waiting[0] = head
            return head
        return None

    def _num_new_tokens_prefill(self, seq_group: SequenceGroup,
                                budget: DecodingSchedulingBudget,
                                enable_chunking: bool) -> int:
        seq = seq_group.get_seqs()[0]
        num = seq.data.get_num_uncomputed_tokens()
        if enable_chunking:
            allowance = budget.remaining_chunk_allowance()
            if num > allowance:
                # Partial chunk: align DOWN to the query tile so mid-prompt
                # chunk boundaries (and hence every later chunk's context
                # length) stay tile-aligned and the builder's padded region
                # stays inside the bucket the budget planned for.
                tile = budget.tile or 1
                num = (allowance // tile) * tile
        return num

    def _preemption_mode(self, seq_group: SequenceGroup) -> str:
        if self.user_specified_preemption_mode:
            return self.user_specified_preemption_mode
        # Single-seq groups recompute (cheap, no KV transfer); multi-seq
        # groups swap to preserve divergent branches
        # (reference: scheduler.py:984 _preempt).
        if seq_group.get_max_num_running_seqs() == 1:
            return PreemptionMode.RECOMPUTE
        return PreemptionMode.SWAP

    def _preempt(self, seq_group: SequenceGroup,
                 blocks_to_swap_out: List[Tuple[int, int]]) -> str:
        mode = self._preemption_mode(seq_group)
        self.num_cumulative_preemption += 1
        if self.num_cumulative_preemption % 50 == 1:
            logger.warning(
                "preempting request %s by %s (cumulative %d) — consider "
                "more KV pages or smaller max_num_seqs",
                seq_group.request_id, mode, self.num_cumulative_preemption)
        if mode == PreemptionMode.RECOMPUTE:
            for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
                seq.status = SequenceStatus.WAITING
                self.block_manager.free(seq)
                seq.data.reset_state_for_recompute()
            self.waiting.appendleft(seq_group)
        else:
            if not self.block_manager.can_swap_out(seq_group):
                raise RuntimeError(
                    "cannot swap out: host swap space exhausted; "
                    "aborting would lose the request")
            blocks_to_swap_out.extend(self.block_manager.swap_out(seq_group))
            for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
                seq.status = SequenceStatus.SWAPPED
            self.swapped.append(seq_group)
        return mode

    def _artificial_preempt_hit(self) -> bool:
        return (self.artificial_preempt
                and random.random() < ARTIFICIAL_PREEMPTION_PROB)

    def _pop_nonbusy_victim(self) -> Optional[SequenceGroup]:
        """Lowest-priority NON-busy running group, or None.

        Async mode keeps in-flight groups in `running` with busy set;
        preempting one would reset/free its state while its batch is still
        executing on device — the late output would then corrupt the
        recomputed sequence (observed as early-token divergence under
        artificial preemption + async scheduling)."""
        skipped = []
        victim = None
        while self.running:
            g = self.running.pop()
            if g.busy:
                skipped.append(g)
            else:
                victim = g
                break
        while skipped:
            self.running.append(skipped.pop())
        return victim

    # ---------------------------------------------------- running schedule
    def _schedule_running(self, budget: DecodingSchedulingBudget,
                          out: DecodingSchedulerOutput,
                          enable_chunking: bool) -> None:
        running: Deque[SequenceGroup] = deque()
        while self.running:
            seq_group = self.running.popleft()
            if seq_group.request_id in self.aborted_requests:
                self._abort_group(seq_group)
                continue
            if seq_group.busy:
                running.append(seq_group)
                continue
            if seq_group.is_prefill():
                # chunked prefill continuation
                num_new = self._num_new_tokens_prefill(
                    seq_group, budget, enable_chunking)
                num_seqs = seq_group.num_seqs(SequenceStatus.RUNNING)
                if num_new == 0 or not budget.can_schedule(
                        num_new_tokens=num_new, num_new_seqs=0,
                        prefill=True):
                    running.append(seq_group)
                    continue
            else:
                # n>1: the prompt's prefill just completed on the lead
                # sequence; activate siblings so each recomputes the last
                # prompt position as a decode row and samples its own
                # first token (prompt KV is shared via the block tables).
                for sib in seq_group.get_seqs(SequenceStatus.RUNNING)[1:]:
                    if (sib.data.stage.name == "PREFILL"
                            and sib.data.get_num_computed_tokens() == 0):
                        sib.data.update_num_computed_tokens(
                            sib.get_len() - 1)
                num_seqs = seq_group.num_seqs(SequenceStatus.RUNNING)
                num_new = num_seqs
                if not budget.can_schedule(num_new_tokens=num_new,
                                           num_new_seqs=0):
                    running.append(seq_group)
                    continue
            # Ensure pages for the new tokens; preempt victims if needed.
            preempted_self = False
            can_append = (not self._artificial_preempt_hit()
                          and self.block_manager.can_append_slots(seq_group))
            while not can_append:
                victim = self._pop_nonbusy_victim()
                if victim is not None:
                    self._preempt(victim, out.blocks_to_swap_out)
                    out.preempted += 1
                else:
                    self._preempt(seq_group, out.blocks_to_swap_out)
                    out.preempted += 1
                    preempted_self = True
                    break
                can_append = self.block_manager.can_append_slots(seq_group)
            if preempted_self:
                continue

            lookahead = 0 if seq_group.is_prefill() \
                else self._group_multi_step(seq_group) - 1
            for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
                for cow in self.block_manager.append_slots(
                        seq, num_lookahead_slots=lookahead):
                    out.blocks_to_copy.append(cow)
            budget.add(num_new, 0,
                       prefill_chunk=seq_group.is_prefill())
            out.scheduled_seq_groups.append(ScheduledSequenceGroup(
                seq_group=seq_group, token_chunk_size=num_new))
            if seq_group.is_prefill():
                out.num_prefill_groups += 1
            running.append(seq_group)
        self.running = running

    def _group_multi_step(self, seq_group: SequenceGroup) -> int:
        """How many chained decode iterations this group supports."""
        if self.num_scheduler_steps <= 1:
            return 1
        sp = seq_group.sampling_params
        if sp.use_beam_search:
            return 1  # beam reselection is per-token host work
        if (sp.presence_penalty != 0 or sp.frequency_penalty != 0
                or sp.repetition_penalty != 1.0 or sp.logprobs
                or sp.stop or sp.min_tokens > 0 or sp.logits_processors):
            # penalties need per-token host state; logprob rings and
            # mid-block stop-string truncation land later; min_tokens
            # needs the per-step EOS ban; logits_processors run host-side
            return 1
        if sp.min_tokens > 0 and any(
                s.get_output_len() < sp.min_tokens
                for s in seq_group.get_seqs(SequenceStatus.RUNNING)):
            # the min_tokens stop-token ban is per-token host-refreshed
            return 1
        return self.num_scheduler_steps

    # ---------------------------------------------------- swapped schedule
    def _schedule_swapped(self, budget: DecodingSchedulingBudget,
                          out: DecodingSchedulerOutput) -> None:
        swapped: Deque[SequenceGroup] = deque()
        while self.swapped:
            seq_group = self.swapped.popleft()
            if seq_group.request_id in self.aborted_requests:
                self._abort_group(seq_group)
                continue
            if seq_group.busy:
                swapped.append(seq_group)
                continue
            alloc = self.block_manager.can_swap_in(seq_group)
            if alloc == AllocStatus.NEVER:
                logger.warning("request %s can never be swapped in; ignored",
                               seq_group.request_id)
                self._ignore_group(seq_group, out)
                continue
            num_seqs = seq_group.num_seqs(SequenceStatus.SWAPPED)
            num_new = num_seqs  # decode resumption
            if alloc == AllocStatus.LATER or not budget.can_schedule(
                    num_new_tokens=num_new, num_new_seqs=num_seqs):
                swapped.append(seq_group)
                break
            out.blocks_to_swap_in.extend(
                self.block_manager.swap_in(seq_group))
            for seq in seq_group.get_seqs(SequenceStatus.SWAPPED):
                seq.status = SequenceStatus.RUNNING
            for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
                for cow in self.block_manager.append_slots(seq):
                    out.blocks_to_copy.append(cow)
            budget.add(num_new, num_seqs)
            out.scheduled_seq_groups.append(ScheduledSequenceGroup(
                seq_group=seq_group, token_chunk_size=num_new))
            self.running.append(seq_group)
        # deferred (busy / over-budget) groups keep FCFS priority
        swapped.extend(self.swapped)
        self.swapped = swapped

    # ---------------------------------------------------- prefill schedule
    def _schedule_prefills(self, budget: DecodingSchedulingBudget,
                           out: DecodingSchedulerOutput,
                           enable_chunking: bool) -> None:
        while True:
            seq_group = self._convert_waiting_head()
            if seq_group is None:
                break
            seq = seq_group.get_seqs()[0]
            if seq.get_len() > self.scheduler_config.max_model_len:
                logger.warning(
                    "request %s: prompt of %d tokens longer than "
                    "max_model_len; ignored", seq_group.request_id,
                    seq.get_len())
                self.waiting.popleft()
                self._ignore_group(seq_group, out)
                continue
            alloc = self.block_manager.can_allocate(seq_group)
            if alloc == AllocStatus.NEVER:
                logger.warning("request %s can never fit in KV cache; "
                               "ignored", seq_group.request_id)
                self.waiting.popleft()
                self._ignore_group(seq_group, out)
                continue
            if alloc == AllocStatus.LATER:
                break
            num_new = self._num_new_tokens_prefill(seq_group, budget,
                                                   enable_chunking)
            num_seqs = seq_group.get_max_num_running_seqs()
            if num_new == 0 or not budget.can_schedule(
                    num_new_tokens=num_new, num_new_seqs=num_seqs,
                    prefill=True):
                break
            self.waiting.popleft()
            self.block_manager.allocate(seq_group)
            # Prefix-cache hit: skip already-computed prefix tokens.
            # prompt_logprobs needs the distribution at every prompt
            # position, so cached rows must still be computed (reference
            # behaviour: prefix reuse is bypassed for prompt-logprob
            # requests).
            cached = self.block_manager.get_num_computed_prefix_tokens(seq)
            if seq_group.sampling_params.prompt_logprobs is not None:
                cached = 0
            if cached > 0 and seq.data.get_num_computed_tokens() == 0:
                seq.data.update_num_computed_tokens(cached)
                num_new = self._num_new_tokens_prefill(seq_group, budget,
                                                       enable_chunking)
            for s in seq_group.get_seqs(SequenceStatus.WAITING):
                s.status = SequenceStatus.RUNNING
            seq_group.metrics.on_first_schedule()
            budget.add(num_new, num_seqs, prefill_chunk=True)
            out.scheduled_seq_groups.append(ScheduledSequenceGroup(
                seq_group=seq_group, token_chunk_size=num_new))
            out.num_prefill_groups += 1
            self.running.append(seq_group)

    # ----------------------------------------------------------- policies
    def _schedule_default(self, budget: DecodingSchedulingBudget
                          ) -> DecodingSchedulerOutput:
        out = DecodingSchedulerOutput()
        # Prefill-priority: admit new prompts only when nothing is swapped.
        if not self.swapped:
            self._schedule_prefills(budget, out, enable_chunking=False)
        if out.num_prefill_groups == 0:
            self._schedule_running(budget, out, enable_chunking=False)
            if out.preempted == 0:
                self._schedule_swapped(budget, out)
        out.num_batched_tokens = budget.num_batched_tokens
        self._finalize_multi_step(out)
        return out

    def _schedule_chunked(self, budget: DecodingSchedulingBudget
                          ) -> DecodingSchedulerOutput:
        out = DecodingSchedulerOutput()
        # Decode-priority: running first, then swapped, then prompt chunks.
        self._schedule_running(budget, out, enable_chunking=True)
        if out.preempted == 0:
            self._schedule_swapped(budget, out)
        self._schedule_prefills(budget, out, enable_chunking=True)
        out.num_batched_tokens = budget.num_batched_tokens
        self._finalize_multi_step(out)
        return out

    def _finalize_multi_step(self, out: DecodingSchedulerOutput) -> None:
        """K chained decode iterations apply only to pure-decode batches
        where every group opted in."""
        if (self.num_scheduler_steps <= 1 or out.num_prefill_groups > 0
                or not out.scheduled_seq_groups):
            return
        k = min(self._group_multi_step(s.seq_group)
                for s in out.scheduled_seq_groups)
        out.multi_step = max(k, 1)

    # ------------------------------------------------------------ metadata
    def _build_metadata(self, out: DecodingSchedulerOutput) -> None:
        now_busy = []
        for sched in out.scheduled_seq_groups:
            g = sched.seq_group
            g.busy = True
            now_busy.append(g)
            is_prompt = g.is_prefill()
            running_seqs = g.get_seqs(SequenceStatus.RUNNING)
            if is_prompt:
                # n>1 siblings wait until the lead sequence's prompt KV is
                # complete (activated in _schedule_running).
                running_seqs = running_seqs[:1]
            block_tables = {}
            seq_data = {}
            for seq in running_seqs:
                block_tables[seq.seq_id] = \
                    self.block_manager.get_block_table(seq)
                seq_data[seq.seq_id] = seq.data
            # Sampling happens only on the final chunk of a prompt
            # (reference: scheduler.py:891-903).
            do_sample = True
            if is_prompt:
                seq = g.get_seqs()[0]
                remaining = seq.data.get_num_uncomputed_tokens()
                if sched.token_chunk_size < remaining:
                    do_sample = False
            out.seq_group_metadata_list.append(SequenceGroupMetadata(
                request_id=g.request_id, is_prompt=is_prompt,
                seq_data=seq_data, sampling_params=g.sampling_params,
                block_tables=block_tables, do_sample=do_sample,
                token_chunk_size=sched.token_chunk_size,
                eos_token_id=g.get_seqs()[0].eos_token_id))

    # ------------------------------------------------------------- cleanup
    def _ignore_group(self, seq_group: SequenceGroup,
                      out: DecodingSchedulerOutput) -> None:
        for seq in seq_group.get_seqs():
            seq.status = SequenceStatus.FINISHED_IGNORED
        out.ignored_seq_groups.append(seq_group)
        self.requests.discard(seq_group.request_id)

    def _abort_group(self, seq_group: SequenceGroup) -> None:
        for seq in seq_group.get_seqs():
            # Free before mutating status (free() dispatches on the block
            # table's recorded location; keeping the status intact here is
            # belt-and-braces for any status-sensitive bookkeeping).
            self.block_manager.free(seq)
            if not seq.is_finished():
                seq.status = SequenceStatus.FINISHED_ABORTED
        self.requests.discard(seq_group.request_id)
        self.aborted_requests.discard(seq_group.request_id)

    def actual_abort(self, request_ids: Set[str]) -> None:
        # waiting-queue aborts handled by base; running/swapped handled
        # lazily inside schedule().
        pass

    def free_finished_request(self, scheduler_output=None) -> None:
        """Clear busy flags, advance computed-token counts, release blocks
        of finished groups (reference: scheduler.py:939-955)."""
        if scheduler_output is None:
            return
        for sched in scheduler_output.scheduled_seq_groups:
            g = sched.seq_group
            g.busy = False
            for seq in g.get_seqs():
                # The forward pass covering this group's scheduled tokens
                # has completed: publish its now-written full blocks to the
                # prefix cache before any free moves them to the evictor.
                self.block_manager.mark_computed_blocks(seq)
                if seq.is_finished():
                    self.block_manager.free(seq)
        still_running = deque()
        for g in self.running:
            if g.is_finished():
                self.block_manager.free_seq_group(g)
                self.requests.discard(g.request_id)
            else:
                still_running.append(g)
        self.running = still_running
