"""Block manager unit tests — coverage the reference lacks (SURVEY.md §4.5)."""

import pytest

from light_vllm_tpu.decoding.block_manager import (AllocStatus,
                                                   BlockSpaceManager,
                                                   LRUEvictor,
                                                   NaiveBlockAllocator,
                                                   PrefixCachingBlockAllocator)
from light_vllm_tpu.decoding.schema import (Sequence, SequenceGroup,
                                            SequenceStatus)
from light_vllm_tpu.decoding.sampling_params import SamplingParams


def make_group(prompt_len, block_size=4, n_seqs=1, seq_id_start=0):
    seqs = [Sequence(seq_id_start + i, list(range(prompt_len)), block_size)
            for i in range(n_seqs)]
    return SequenceGroup(f"g{seq_id_start}", seqs, SamplingParams(),
                         arrival_time=0.0)


def test_naive_allocator_refcount():
    a = NaiveBlockAllocator(4, first_id=1)
    b1 = a.allocate()
    assert a.get_num_free_blocks() == 3
    a.incr(b1)
    a.free(b1)
    assert a.get_num_free_blocks() == 3  # still referenced
    a.free(b1)
    assert a.get_num_free_blocks() == 4


def test_allocate_and_free():
    m = BlockSpaceManager(block_size=4, num_device_blocks=11,
                          num_cpu_blocks=0, watermark=0.0)
    g = make_group(prompt_len=10)  # 3 blocks
    assert m.can_allocate(g) == AllocStatus.OK
    m.allocate(g)
    assert m.get_num_free_device_blocks() == 10 - 3
    seq = g.seqs[0]
    assert len(m.get_block_table(seq)) == 3
    m.free(seq)
    assert m.get_num_free_device_blocks() == 10


def test_never_fits():
    m = BlockSpaceManager(block_size=4, num_device_blocks=3,
                          num_cpu_blocks=0)
    g = make_group(prompt_len=100)
    assert m.can_allocate(g) == AllocStatus.NEVER


def test_append_slots_grows_table():
    m = BlockSpaceManager(block_size=4, num_device_blocks=11,
                          num_cpu_blocks=0, watermark=0.0)
    g = make_group(prompt_len=4)
    m.allocate(g)
    seq = g.seqs[0]
    seq.status = SequenceStatus.RUNNING
    assert len(m.get_block_table(seq)) == 1
    for i in range(4):
        seq.append_token_id(7)
    cows = m.append_slots(seq)
    assert cows == []
    assert len(m.get_block_table(seq)) == 2


def test_fork_cow():
    m = BlockSpaceManager(block_size=4, num_device_blocks=11,
                          num_cpu_blocks=0, watermark=0.0)
    g = make_group(prompt_len=6)
    m.allocate(g)
    parent = g.seqs[0]
    parent.status = SequenceStatus.RUNNING
    child = parent.fork(99)
    g.add_seq(child)
    m.fork(parent, child)
    assert m.get_block_table(parent) == m.get_block_table(child)
    # child appends within last (shared, partial) block → CoW
    child.append_token_id(3)
    cows = m.append_slots(child)
    assert len(cows) == 1
    assert m.get_block_table(parent) != m.get_block_table(child)


def test_swap_out_in_roundtrip():
    m = BlockSpaceManager(block_size=4, num_device_blocks=11,
                          num_cpu_blocks=8, watermark=0.0)
    g = make_group(prompt_len=10)
    m.allocate(g)
    seq = g.seqs[0]
    seq.status = SequenceStatus.RUNNING
    table_before = m.get_block_table(seq)
    pairs_out = m.swap_out(g)
    assert len(pairs_out) == 3
    seq.status = SequenceStatus.SWAPPED
    assert m.get_num_free_device_blocks() == 10
    pairs_in = m.swap_in(g)
    assert len(pairs_in) == 3
    seq.status = SequenceStatus.RUNNING
    assert m.get_num_free_device_blocks() == 7


def test_prefix_caching_hit():
    m = BlockSpaceManager(block_size=4, num_device_blocks=32,
                          num_cpu_blocks=0, enable_prefix_caching=True,
                          watermark=0.0)
    g1 = make_group(prompt_len=12, seq_id_start=0)  # 3 full blocks
    m.allocate(g1)
    t1 = m.get_block_table(g1.seqs[0])
    # identical prompt BEFORE g1's forward pass ran: no hit may occur
    # (blocks are published-but-uncomputed)
    g_early = make_group(prompt_len=12, seq_id_start=20)
    m.allocate(g_early)
    assert m.get_num_computed_prefix_tokens(g_early.seqs[0]) == 0
    m.free(g_early.seqs[0])
    # simulate the prefill forward pass completing for g1
    g1.seqs[0].data.update_num_computed_tokens(12)
    m.mark_computed_blocks(g1.seqs[0])
    # identical prompt → full-block prefix shared
    g2 = make_group(prompt_len=12, seq_id_start=10)
    m.allocate(g2)
    t2 = m.get_block_table(g2.seqs[0])
    # first two blocks shared (last full block not counted as computed
    # because at least one token must be recomputed for logits)
    assert t1[:2] == t2[:2]
    cached = m.get_num_computed_prefix_tokens(g2.seqs[0])
    assert cached == 8
    assert m.get_prefix_cache_hit_rate() > 0


def test_prefix_cache_eviction_resurrection():
    a = PrefixCachingBlockAllocator(4, first_id=1)
    b1 = a.allocate()
    b1 = a.mark_full(b1, content_hash=111, num_hashed_tokens=4, now=1)
    a.mark_computed(b1)  # forward pass wrote the block's KV
    a.free(b1)  # refcount 0 → evictable, still cached
    assert a.get_num_free_blocks() == 4
    hit = a.lookup(111)
    assert hit == b1
    a.touch(hit, 2)  # resurrect
    assert a.get_refcount(b1) == 1
    a.free(b1)
    # exhaust: allocate 4 → must evict b1
    ids = [a.allocate() for _ in range(4)]
    assert b1 in ids
    assert a.lookup(111) is None


def test_lru_evictor_order():
    e = LRUEvictor()
    e.add(1, last_accessed=5, num_hashed_tokens=4)
    e.add(2, last_accessed=3, num_hashed_tokens=8)
    e.add(3, last_accessed=3, num_hashed_tokens=12)
    # oldest access wins; tie → most hashed tokens first
    assert e.evict() == 3
    assert e.evict() == 2
    assert e.evict() == 1
