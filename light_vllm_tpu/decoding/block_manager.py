"""Paged KV block management: allocators, CoW, swap, prefix caching.

Counterpart of the reference's block-manager stack (reference:
light_vllm/decoding/core/interfaces.py:10-116, block_manager_v1.py:216,
prefix_caching_block.py:48, evictor_v1.py:53). Re-designed host-side (pure
Python/numpy — device never sees this, it only receives block tables):

  - NaiveBlockAllocator: free-list allocator.
  - PrefixCachingBlockAllocator: content-hash chaining + refcounts + LRU
    evictor; full blocks promote to immutable cached blocks.
  - BlockSpaceManager: per-sequence block tables, append_slots with
    copy-on-write for forked beams, swap in/out mappings device<->host.

Block 0 of the device cache is reserved as the null/trash page (padded
batch rows point at it), so allocators hand out ids starting at 1.
"""

import enum
import heapq
from typing import Dict, List, Optional, Set, Tuple

from light_vllm_tpu.decoding.schema import Sequence, SequenceGroup, \
    SequenceStatus
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

BlockId = int


class AllocStatus(enum.Enum):
    OK = enum.auto()
    LATER = enum.auto()
    NEVER = enum.auto()


class LRUEvictor:
    """Tracks evictable (refcount-0) cached blocks in LRU order with
    num-hashed-tokens tiebreak (reference: evictor_v1.py:53; ordered like
    evictor_v2's structures). O(log n) via a lazy-deletion heap: remove()
    just drops the table entry, evict() pops stale heap entries until a
    live one surfaces."""

    def __init__(self) -> None:
        self.free_table: Dict[BlockId, Tuple[int, int]] = \
            {}  # block_id -> (last_accessed, num_hashed_tokens)
        self._heap: List[Tuple[int, int, BlockId]] = []

    def __contains__(self, block_id: BlockId) -> bool:
        return block_id in self.free_table

    @property
    def num_blocks(self) -> int:
        return len(self.free_table)

    def add(self, block_id: BlockId, last_accessed: int,
            num_hashed_tokens: int) -> None:
        # Oldest access evicts first; among ties the most hashed tokens
        # (longest chains die first, matching the reference policy).
        self.free_table[block_id] = (last_accessed, num_hashed_tokens)
        heapq.heappush(self._heap,
                       (last_accessed, -num_hashed_tokens, block_id))

    def remove(self, block_id: BlockId) -> None:
        del self.free_table[block_id]  # heap entry invalidated lazily

    def evict(self) -> BlockId:
        while self._heap:
            ts, neg_nh, bid = heapq.heappop(self._heap)
            if self.free_table.get(bid) == (ts, -neg_nh):
                del self.free_table[bid]
                return bid
        raise RuntimeError("no evictable blocks")


class NaiveBlockAllocator:
    """Free-list allocator (reference: UncachedBlockAllocator,
    block_manager_v1.py:157)."""

    def __init__(self, num_blocks: int, first_id: int = 1) -> None:
        self.num_blocks = num_blocks
        # Min-heap: allocation always hands out the LOWEST free id, so a
        # multi-page prefill allocation lands on a physically contiguous
        # ascending run whenever the low end of the pool is free — the
        # decode attention kernel coalesces such runs into one DMA per
        # fetch chunk (ops/paged_attention_pallas.py contig fast path).
        # Unlike a LIFO list (whose order scrambles permanently after the
        # first free wave), the heap re-forms runs every time a region
        # drains; under fragmentation the kernel just falls back to
        # per-page fetches.
        self.free_list: List[BlockId] = list(
            range(first_id, first_id + num_blocks))
        self.refcount: Dict[BlockId, int] = {}

    def get_num_free_blocks(self) -> int:
        return len(self.free_list)

    def allocate(self, content_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> BlockId:
        if not self.free_list:
            raise RuntimeError("out of KV blocks")
        bid = heapq.heappop(self.free_list)
        self.refcount[bid] = 1
        return bid

    def incr(self, block_id: BlockId) -> int:
        self.refcount[block_id] += 1
        return self.refcount[block_id]

    def free(self, block_id: BlockId) -> None:
        rc = self.refcount[block_id] - 1
        if rc == 0:
            del self.refcount[block_id]
            heapq.heappush(self.free_list, block_id)
        else:
            self.refcount[block_id] = rc

    def get_refcount(self, block_id: BlockId) -> int:
        return self.refcount.get(block_id, 0)

    # prefix-caching interface stubs
    def mark_full(self, block_id: BlockId, content_hash: int,
                  num_hashed_tokens: int, now: int) -> BlockId:
        return block_id

    def lookup(self, content_hash: int) -> Optional[BlockId]:
        return None

    def touch(self, block_id: BlockId, now: int) -> None:
        pass

    def mark_computed(self, block_id: BlockId) -> None:
        pass


class PrefixCachingBlockAllocator(NaiveBlockAllocator):
    """Content-hash chained block reuse with LRU eviction (reference:
    prefix_caching_block.py:48-839). A full block whose content hash is known
    becomes "cached"; a later sequence with the same prefix chain gets the
    block for free (refcount bump). Refcount-0 cached blocks stay resident
    and evictable until space is needed."""

    def __init__(self, num_blocks: int, first_id: int = 1) -> None:
        super().__init__(num_blocks, first_id)
        self.cached: Dict[int, BlockId] = {}          # hash -> block
        self.hash_of: Dict[BlockId, int] = {}
        self.num_hashed: Dict[BlockId, int] = {}
        # Blocks whose KV has actually been written by a forward pass.
        # mark_full publishes the content hash at *allocation* time (so
        # duplicate in-flight prefills dedupe onto one block), but a lookup
        # may only skip compute on blocks marked computed — otherwise a
        # second request can hit a block whose KV was never written
        # (chunked prefill / recompute preemption mid-prefill) and read
        # zero pages (reference analog: ComputedBlocksTracker,
        # prefix_caching_block.py:839).
        self.computed: Set[BlockId] = set()
        self.evictor = LRUEvictor()
        self.hits = 0
        self.misses = 0

    def get_num_free_blocks(self) -> int:
        return len(self.free_list) + self.evictor.num_blocks

    def allocate(self, content_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> BlockId:
        if self.free_list:
            bid = heapq.heappop(self.free_list)
        elif self.evictor.num_blocks:
            bid = self.evictor.evict()
            old_hash = self.hash_of.pop(bid, None)
            if old_hash is not None:
                self.cached.pop(old_hash, None)
            self.num_hashed.pop(bid, None)
            self.computed.discard(bid)
        else:
            raise RuntimeError("out of KV blocks")
        self.refcount[bid] = 1
        return bid

    def lookup(self, content_hash: int) -> Optional[BlockId]:
        bid = self.cached.get(content_hash)
        if bid is None or bid not in self.computed:
            self.misses += 1
            return None
        self.hits += 1
        return bid

    def mark_computed(self, block_id: BlockId) -> None:
        self.computed.add(block_id)

    def touch(self, block_id: BlockId, now: int) -> None:
        """Take a reference on a cached block (maybe resurrect from
        evictor)."""
        if block_id in self.evictor:
            self.evictor.remove(block_id)
            self.refcount[block_id] = 1
        else:
            self.incr(block_id)

    def mark_full(self, block_id: BlockId, content_hash: int,
                  num_hashed_tokens: int, now: int) -> BlockId:
        """Promote a freshly filled block to cached status; if an identical
        cached block already exists, dedupe onto it (reference:
        promote_to_immutable_block:415)."""
        existing = self.cached.get(content_hash)
        if existing is not None and existing != block_id:
            self.touch(existing, now)
            self.free(block_id)
            return existing
        self.cached[content_hash] = block_id
        self.hash_of[block_id] = content_hash
        self.num_hashed[block_id] = num_hashed_tokens
        return block_id

    def free(self, block_id: BlockId) -> None:
        rc = self.refcount[block_id] - 1
        if rc > 0:
            self.refcount[block_id] = rc
            return
        del self.refcount[block_id]
        h = self.hash_of.get(block_id)
        if h is not None and self.cached.get(h) == block_id:
            # Keep content resident; evictable.
            self.evictor.add(block_id, self._now(), self.num_hashed[block_id])
        else:
            self.computed.discard(block_id)
            heapq.heappush(self.free_list, block_id)

    _tick = 0

    def _now(self) -> int:
        PrefixCachingBlockAllocator._tick += 1
        return PrefixCachingBlockAllocator._tick


def make_block_allocator(num_blocks: int, first_id: int = 1,
                         prefix_caching: bool = False):
    """Pure-Python allocators.

    A C++ host-runtime allocator existed through r4 (parity-tested ctypes
    bridge). It was DELETED in r5 on measurement
    (benchmarks/bench_scheduler.py): allocator ops are ~7% of scheduler
    step time (cProfile, 256 running seqs) and the per-op ctypes FFI
    overhead made the native path 0.76-0.93x of Python across every
    (N seqs, prefix-caching) cell — a net loss with no Amdahl headroom.
    Less surface beats unproven speed; the code is in git history if a
    batched-FFI design ever justifies revival."""
    cls = PrefixCachingBlockAllocator if prefix_caching \
        else NaiveBlockAllocator
    return cls(num_blocks, first_id=first_id)


class BlockTable:
    """Per-sequence mapping logical block -> physical BlockId."""

    def __init__(self) -> None:
        self.blocks: List[BlockId] = []
        # number of tokens of this seq known to be in cached (computed)
        # blocks at allocation time (prefix-cache hit prefix length)
        self.num_computed_prefix_tokens = 0
        # Which allocator owns these block ids. Recorded here rather than
        # dispatched on seq.status so aborts/frees are correct regardless
        # of when the caller mutates the status (a swapped group aborted
        # after its status changed used to free CPU ids into the device
        # allocator).
        self.on_device = True
        # blocks[:num_computed_blocks] have had their KV written by a
        # completed forward pass (prefix-caching publish gate).
        self.num_computed_blocks = 0

    def copy(self) -> "BlockTable":
        bt = BlockTable()
        bt.blocks = list(self.blocks)
        bt.num_computed_prefix_tokens = self.num_computed_prefix_tokens
        bt.on_device = self.on_device
        bt.num_computed_blocks = self.num_computed_blocks
        return bt


class BlockSpaceManager:
    """Block tables + allocation/append/fork/swap/CoW for the decoding
    scheduler (reference: block_manager_v1.py:216 BlockSpaceManagerV1; the
    layered v2 collapses into this one class because the TPU design has a
    single flat slot space per cache)."""

    def __init__(self, block_size: int, num_device_blocks: int,
                 num_cpu_blocks: int, *, enable_prefix_caching: bool = False,
                 sliding_window: Optional[int] = None,
                 watermark: float = 0.01) -> None:
        self.block_size = block_size
        # block 0 reserved as null page
        self.num_device_blocks = num_device_blocks - 1
        self.num_cpu_blocks = num_cpu_blocks
        if enable_prefix_caching and sliding_window is not None:
            raise ValueError(
                "prefix caching is incompatible with sliding-window KV "
                "rotation (rotated blocks invalidate content hashes)")
        self.enable_prefix_caching = enable_prefix_caching
        self.sliding_window = sliding_window
        self.device_allocator = make_block_allocator(
            self.num_device_blocks, first_id=1,
            prefix_caching=enable_prefix_caching)
        self.cpu_allocator = NaiveBlockAllocator(num_cpu_blocks, first_id=0)
        self.block_tables: Dict[int, BlockTable] = {}  # seq_id -> table
        self.watermark_blocks = int(watermark * self.num_device_blocks)
        self._tick = 0

    def _now(self) -> int:
        self._tick += 1
        return self._tick

    # --- allocate (prefill admission) -------------------------------------
    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs(SequenceStatus.WAITING)[0]
        # Admission must use the true number of blocks allocate() takes:
        # the full logical count even under sliding window. (The reference
        # reuses prompt blocks modulo the window, but its prefill attention
        # reads fresh K/V tensors — ours reads the paged cache, so aliased
        # slots inside one prefill scatter would corrupt in-window context.
        # We allocate the whole prompt and rotate only during decode.)
        num_needed = seq.num_logical_blocks()
        free = self.device_allocator.get_num_free_blocks()
        if num_needed > self.num_device_blocks:
            return AllocStatus.NEVER
        if free - num_needed >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        seq = seq_group.get_seqs(SequenceStatus.WAITING)[0]
        bt = BlockTable()
        n_blocks = seq.num_logical_blocks()
        full_blocks = seq.get_len() // self.block_size
        now = self._now()
        matched_prefix = True
        for i in range(n_blocks):
            is_full = i < full_blocks
            if self.enable_prefix_caching and is_full and matched_prefix:
                h = seq.hash_of_block(i)
                hit = self.device_allocator.lookup(h)
                if hit is not None:
                    self.device_allocator.touch(hit, now)
                    bt.blocks.append(hit)
                    bt.num_computed_prefix_tokens = \
                        (i + 1) * self.block_size
                    continue
                matched_prefix = False
                bid = self.device_allocator.allocate()
                bid = self.device_allocator.mark_full(
                    bid, h, seq.num_hashed_tokens_of_block(i), now)
                bt.blocks.append(bid)
                continue
            bid = self.device_allocator.allocate()
            if self.enable_prefix_caching and is_full:
                bid = self.device_allocator.mark_full(
                    bid, seq.hash_of_block(i),
                    seq.num_hashed_tokens_of_block(i), now)
            bt.blocks.append(bid)
        # Never report the whole prompt as computed — at least the last
        # token must be recomputed to produce logits.
        if bt.num_computed_prefix_tokens >= seq.get_len():
            bt.num_computed_prefix_tokens = \
                max(0, seq.get_len() - self.block_size)
        for s in seq_group.get_seqs(SequenceStatus.WAITING):
            self.block_tables[s.seq_id] = bt.copy() if s is not seq else bt
            if s is not seq:
                for bid in bt.blocks:
                    self.device_allocator.incr(bid)

    # --- append (decode growth) -------------------------------------------
    def can_append_slots(self, seq_group: SequenceGroup,
                         num_lookahead_slots: int = 0) -> bool:
        num_seqs = seq_group.num_seqs(SequenceStatus.RUNNING)
        blocks_per_seq = 1 + num_lookahead_slots // self.block_size
        free = self.device_allocator.get_num_free_blocks()
        return num_seqs * blocks_per_seq <= free

    def append_slots(self, seq: Sequence,
                     num_lookahead_slots: int = 0) -> List[Tuple[int, int]]:
        """Ensure the table covers the sequence (+lookahead tokens for
        multi-step decode); returns CoW (src, dst) pairs (reference:
        block_manager_v1.py append_slots:428)."""
        bt = self.block_tables[seq.seq_id]
        cows: List[Tuple[int, int]] = []
        needed = -(-(seq.get_len() + num_lookahead_slots)
                   // self.block_size)
        if self.sliding_window is not None:
            window_blocks = self.sliding_window // self.block_size + 1
            if len(bt.blocks) >= window_blocks and needed > len(bt.blocks):
                # Rotate: reuse the block that slid out of the window
                # (reference: block_manager_v1.py:441-445). incr keeps the
                # refcount balanced with free(), which releases every table
                # entry including duplicates.
                reused = bt.blocks[len(bt.blocks) % window_blocks]
                self.device_allocator.incr(reused)
                bt.blocks.append(reused)
                return cows
            if len(bt.blocks) >= window_blocks:
                # Rotating tables carry duplicate entries, so the CoW
                # refcount test below would misfire; forks are rejected
                # under sliding window (see fork()), so no CoW is needed.
                return cows
        while len(bt.blocks) < needed:
            bt.blocks.append(self.device_allocator.allocate())
        # CoW when the last block is shared (forked beams).
        last = bt.blocks[-1]
        if self.device_allocator.get_refcount(last) > 1:
            new_block = self.device_allocator.allocate()
            self.device_allocator.free(last)
            bt.blocks[-1] = new_block
            cows.append((last, new_block))
        # Prefix caching: promote the newest *full* block.
        if self.enable_prefix_caching:
            full_blocks = seq.get_len() // self.block_size
            if full_blocks >= 1 and full_blocks <= len(bt.blocks):
                idx = full_blocks - 1
                bid = bt.blocks[idx]
                h = seq.hash_of_block(idx)
                if self.device_allocator.hash_of.get(bid) != h:
                    new_bid = self.device_allocator.mark_full(
                        bid, h, seq.num_hashed_tokens_of_block(idx),
                        self._now())
                    if new_bid != bid:
                        bt.blocks[idx] = new_bid
        return cows

    def fork(self, parent: Sequence, child: Sequence) -> None:
        if self.sliding_window is not None:
            raise NotImplementedError(
                "fork (n>1) is not supported with sliding-window KV "
                "rotation: rotated tables alias blocks, so the CoW "
                "refcount test cannot tell forks from self-aliases")
        bt = self.block_tables[parent.seq_id]
        self.block_tables[child.seq_id] = bt.copy()
        for bid in bt.blocks:
            self.device_allocator.incr(bid)

    # --- swap -------------------------------------------------------------
    def can_swap_in(self, seq_group: SequenceGroup) -> AllocStatus:
        blocks: Set[BlockId] = set()
        for seq in seq_group.get_seqs(SequenceStatus.SWAPPED):
            blocks.update(self.block_tables[seq.seq_id].blocks)
        needed = len(blocks) + seq_group.num_seqs(SequenceStatus.SWAPPED)
        free = self.device_allocator.get_num_free_blocks()
        if needed > self.num_device_blocks:
            return AllocStatus.NEVER
        if free - needed >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def swap_in(self, seq_group: SequenceGroup) -> List[Tuple[int, int]]:
        mapping: Dict[BlockId, BlockId] = {}
        pairs: List[Tuple[int, int]] = []
        for seq in seq_group.get_seqs(SequenceStatus.SWAPPED):
            bt = self.block_tables[seq.seq_id]
            new_blocks = []
            for cpu_bid in bt.blocks:
                if cpu_bid in mapping:
                    dev_bid = mapping[cpu_bid]
                    self.device_allocator.incr(dev_bid)
                else:
                    dev_bid = self.device_allocator.allocate()
                    mapping[cpu_bid] = dev_bid
                    pairs.append((cpu_bid, dev_bid))
                new_blocks.append(dev_bid)
            for cpu_bid in bt.blocks:
                self.cpu_allocator.free(cpu_bid)
            bt.blocks = new_blocks
            bt.on_device = True
        return pairs

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        blocks: Set[BlockId] = set()
        for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
            blocks.update(self.block_tables[seq.seq_id].blocks)
        return len(blocks) <= self.cpu_allocator.get_num_free_blocks()

    def swap_out(self, seq_group: SequenceGroup) -> List[Tuple[int, int]]:
        mapping: Dict[BlockId, BlockId] = {}
        pairs: List[Tuple[int, int]] = []
        for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
            bt = self.block_tables[seq.seq_id]
            new_blocks = []
            for dev_bid in bt.blocks:
                if dev_bid in mapping:
                    cpu_bid = mapping[dev_bid]
                    self.cpu_allocator.incr(cpu_bid)
                else:
                    cpu_bid = self.cpu_allocator.allocate()
                    mapping[dev_bid] = cpu_bid
                    pairs.append((dev_bid, cpu_bid))
                new_blocks.append(cpu_bid)
            for dev_bid in bt.blocks:
                self.device_allocator.free(dev_bid)
            bt.blocks = new_blocks
            bt.on_device = False
        return pairs

    # --- free -------------------------------------------------------------
    def free(self, seq: Sequence) -> None:
        bt = self.block_tables.pop(seq.seq_id, None)
        if bt is None:
            return
        # Dispatch on where the blocks actually live (recorded at swap
        # time), NOT on seq.status — an abort may have already overwritten
        # the status, and freeing CPU ids into the device allocator
        # corrupts refcounts of live sequences.
        allocator = self.device_allocator if bt.on_device \
            else self.cpu_allocator
        for bid in bt.blocks:
            allocator.free(bid)

    def free_seq_group(self, seq_group: SequenceGroup) -> None:
        for seq in seq_group.get_seqs():
            self.free(seq)

    def get_block_table(self, seq: Sequence) -> List[int]:
        return list(self.block_tables[seq.seq_id].blocks)

    def get_num_computed_prefix_tokens(self, seq: Sequence) -> int:
        return self.block_tables[seq.seq_id].num_computed_prefix_tokens

    def mark_computed_blocks(self, seq: Sequence) -> None:
        """Publish blocks fully covered by the forward pass that just
        completed: only now may a prefix-cache lookup skip their tokens
        (reference: mark_blocks_as_computed / ComputedBlocksTracker)."""
        if not self.enable_prefix_caching:
            return
        bt = self.block_tables.get(seq.seq_id)
        if bt is None:
            return
        n_full = min(seq.data.get_num_computed_tokens() // self.block_size,
                     len(bt.blocks))
        for i in range(bt.num_computed_blocks, n_full):
            self.device_allocator.mark_computed(bt.blocks[i])
        bt.num_computed_blocks = max(bt.num_computed_blocks, n_full)

    def mark_prefix_consumed(self, seq: Sequence) -> None:
        self.block_tables[seq.seq_id].num_computed_prefix_tokens = 0

    def get_num_free_device_blocks(self) -> int:
        return self.device_allocator.get_num_free_blocks()

    def get_prefix_cache_hit_rate(self) -> float:
        a = self.device_allocator
        if not self.enable_prefix_caching or not hasattr(a, "hits"):
            return 0.0
        total = a.hits + a.misses
        return a.hits / total if total else 0.0
