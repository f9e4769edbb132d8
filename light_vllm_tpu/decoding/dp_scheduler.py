"""In-engine data-parallel scheduling: one sub-scheduler per dp partition.

Each partition owns a disjoint KV page range (the mesh "dp" shard of the
cache array) and its own block manager, budget, and preemption domain —
the zero-cross-worker-state DP contract of the reference's
gpu_data_parallelism_executor (reference: prefill_only/executor/
gpu_data_parallelism_executor.py:17-81), applied to the decoding engine:
a tp x dp mesh now schedules dp times the sequences of the tp-only case
with the same per-device memory.

The facade routes new requests to the least-loaded partition, merges the
per-partition scheduler outputs into one DecodingSchedulerOutput (swap /
copy block ids globalized with per-partition offsets so the CacheEngine
operates on the global sharded array), and fans free_finished_request
back out. The model-input builder sees `dp_size` + per-group `dp_rank`
and builds one sub-blob per partition against a common executable spec
(decoding/processor.py _call_dp).
"""

from typing import List, Optional, Set, Union

from light_vllm_tpu.decoding.schema import DecodingSchedulerOutput
from light_vllm_tpu.decoding.scheduler import DecodingScheduler
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


class _BlockManagerRouter:
    """Dispatch block-manager calls by the sequence's dp partition (used
    by the output processor's beam fork/free path)."""

    def __init__(self, parts: List[DecodingScheduler]) -> None:
        self._parts = parts

    def _bm(self, seq):
        return self._parts[seq.dp_rank].block_manager

    def fork(self, parent, child) -> None:
        child.dp_rank = parent.dp_rank
        self._bm(parent).fork(parent, child)

    def free(self, seq) -> None:
        self._bm(seq).free(seq)

    def mark_computed_blocks(self, seq) -> None:
        self._bm(seq).mark_computed_blocks(seq)

    def get_block_table(self, seq):
        return self._bm(seq).get_block_table(seq)


class DataParallelDecodingScheduler:
    """Scheduler facade over `dp` DecodingScheduler partitions."""

    support_scheduling = ["sync_scheduling", "async_scheduling"]

    def __init__(self, scheduler_config, cache_config, request_processor,
                 dp: int) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.dp = dp
        # per-partition offsets for globalizing block ids
        self._dev_stride = cache_config.num_device_blocks
        self._cpu_stride = cache_config.num_cpu_blocks or 0
        self.parts = [
            DecodingScheduler(scheduler_config, cache_config,
                              request_processor) for _ in range(dp)]
        self.block_manager = _BlockManagerRouter(self.parts)

    @classmethod
    def from_engine(cls, engine) -> "DataParallelDecodingScheduler":
        dp = engine.executor.worker.in_engine_dp
        return cls(engine.engine_config.scheduler_config,
                   engine.engine_config.cache_config,
                   engine.request_processor, dp)

    # ---------------------------------------------------------------- queues
    @property
    def waiting(self):
        return [r for p in self.parts for r in p.waiting]

    @property
    def running(self):
        return [g for p in self.parts for g in p.running]

    @property
    def swapped(self):
        return [g for p in self.parts for g in p.swapped]

    @property
    def requests(self) -> Set[str]:
        out: Set[str] = set()
        for p in self.parts:
            out |= p.requests
        return out

    # ------------------------------------------------------------------- api
    def add_request(self, request) -> None:
        # Least-loaded placement: fewest unfinished requests, most free
        # blocks as the tiebreak. Balanced partitions keep the merged
        # executable spec tight (the blob pads every partition to the
        # busiest one's bucket).
        def load(p: DecodingScheduler):
            return (p.get_num_unfinished_requests(),
                    -p.block_manager.get_num_free_device_blocks())

        part = min(self.parts, key=load)
        part.add_request(request)

    def abort_request(self, request_id: Union[str, list]) -> None:
        for p in self.parts:
            p.abort_request(request_id)

    def remove_abort_request(self) -> None:
        for p in self.parts:
            p.remove_abort_request()

    def has_unfinished_requests(self) -> bool:
        return any(p.has_unfinished_requests() for p in self.parts)

    def get_num_unfinished_requests(self) -> int:
        return sum(p.get_num_unfinished_requests() for p in self.parts)

    # ----------------------------------------------------------- rebalancing
    def _rebalance_waiting(self) -> None:
        """Migrate waiting requests from backlogged partitions to starved
        ones. Admission-time placement alone can idle a partition for the
        lifetime of a skewed burst (all its requests finish while another
        partition still holds a deep backlog). Waiting entries own no
        device state — raw requests are untokenized, converted /
        recompute-preempted groups hold zero blocks — so migration is a
        pure host-queue move."""
        starved = [p for p in self.parts
                   if not p.waiting and not p.running and not p.swapped]
        if not starved:
            return
        for recv in starved:
            donor = max(self.parts, key=lambda p: len(p.waiting))
            k = len(donor.waiting) // 2
            if k <= 0:
                return
            # take the newest half off the donor's tail: the donor serves
            # its (older) head this very step, so global FCFS order holds
            moved = [donor.waiting.pop() for _ in range(k)][::-1]
            recv.waiting.extend(moved)
            for r in moved:
                rid = r.request_id
                donor.requests.discard(rid)
                recv.requests.add(rid)
                if rid in donor.aborted_requests:
                    donor.aborted_requests.discard(rid)
                    recv.aborted_requests.add(rid)
            logger.debug("dp rebalance: moved %d waiting requests", k)

    # -------------------------------------------------------------- schedule
    def schedule(self) -> DecodingSchedulerOutput:
        self._rebalance_waiting()
        subs = [p.schedule() for p in self.parts]
        out = DecodingSchedulerOutput()
        out.dp_size = self.dp
        for rank, sub in enumerate(subs):
            for sched in sub.scheduled_seq_groups:
                g = sched.seq_group
                g.dp_rank = rank
                for s in g.get_seqs():
                    s.dp_rank = rank
            for g in sub.ignored_seq_groups:
                g.dp_rank = rank
            dev_off = rank * self._dev_stride
            cpu_off = rank * self._cpu_stride
            out.scheduled_seq_groups.extend(sub.scheduled_seq_groups)
            out.seq_group_metadata_list.extend(
                sub.seq_group_metadata_list)
            out.ignored_seq_groups.extend(sub.ignored_seq_groups)
            out.num_prefill_groups += sub.num_prefill_groups
            out.num_batched_tokens += sub.num_batched_tokens
            out.preempted += sub.preempted
            out.blocks_to_swap_in.extend(
                (c + cpu_off, d + dev_off)
                for c, d in sub.blocks_to_swap_in)
            out.blocks_to_swap_out.extend(
                (d + dev_off, c + cpu_off)
                for d, c in sub.blocks_to_swap_out)
            out.blocks_to_copy.extend(
                (s + dev_off, d + dev_off) for s, d in sub.blocks_to_copy)
        # one executable runs every partition: the multi-step window is
        # the smallest any non-idle partition supports
        ks = [sub.multi_step for sub in subs
              if sub.scheduled_seq_groups]
        out.multi_step = min(ks) if ks else 1
        out._dp_subs = subs
        return out

    def free_finished_request(self, scheduler_output=None) -> None:
        subs = getattr(scheduler_output, "_dp_subs", None)
        if subs is None:
            return
        for p, sub in zip(self.parts, subs):
            p.free_finished_request(sub)

    def actual_abort(self, request_ids: Set[str]) -> None:
        for p in self.parts:
            p.actual_abort(request_ids)
