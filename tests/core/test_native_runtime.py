"""C++ host-runtime allocator behaves identically to the Python one."""

import numpy as np
import pytest

from light_vllm_tpu.decoding.block_manager import (
    NaiveBlockAllocator, PrefixCachingBlockAllocator)

native = pytest.importorskip("light_vllm_tpu.native")
if not native.native_available():
    pytest.skip("native runtime not built", allow_module_level=True)


def test_basic_alloc_free_trace():
    py = NaiveBlockAllocator(8, first_id=1)
    cc = native.NativeBlockAllocator(8, first_id=1)
    ids_py = [py.allocate() for _ in range(8)]
    ids_cc = [cc.allocate() for _ in range(8)]
    assert ids_py == ids_cc
    assert py.get_num_free_blocks() == cc.get_num_free_blocks() == 0
    for i in ids_py[:4]:
        py.free(i)
        cc.free(i)
    assert py.get_num_free_blocks() == cc.get_num_free_blocks() == 4


def test_refcount_parity():
    cc = native.NativeBlockAllocator(4, first_id=1)
    b = cc.allocate()
    assert cc.get_refcount(b) == 1
    cc.incr(b)
    assert cc.get_refcount(b) == 2
    cc.free(b)
    assert cc.get_refcount(b) == 1
    cc.free(b)
    assert cc.get_refcount(b) == 0
    assert cc.get_num_free_blocks() == 4


def test_prefix_cache_parity():
    cc = native.NativeBlockAllocator(4, first_id=1, prefix_caching=True)
    b1 = cc.allocate()
    b1 = cc.mark_full(b1, 111, 4)
    # hash published but KV not yet written: lookup must miss
    assert cc.lookup(111) is None
    cc.mark_computed(b1)
    assert cc.lookup(222) is None
    assert cc.lookup(111) == b1
    cc.free(b1)
    assert cc.get_num_free_blocks() == 4  # evictable, still cached
    hit = cc.lookup(111)
    assert hit == b1
    cc.touch(hit)
    assert cc.get_refcount(b1) == 1
    cc.free(b1)
    ids = [cc.allocate() for _ in range(4)]  # forces eviction of b1
    assert b1 in ids
    assert cc.lookup(111) is None
    assert cc.hits >= 2 and cc.misses >= 2


def test_dedupe_on_mark_full():
    cc = native.NativeBlockAllocator(4, first_id=1, prefix_caching=True)
    b1 = cc.allocate()
    b1 = cc.mark_full(b1, 42, 4)
    b2 = cc.allocate()
    merged = cc.mark_full(b2, 42, 4)
    assert merged == b1
    assert cc.get_refcount(b1) == 2


def test_fuzz_against_python():
    """Realistic op sequences: a block is content-marked at most once while
    live (matching how append_slots/allocate actually use the API)."""
    rng = np.random.default_rng(0)
    py = PrefixCachingBlockAllocator(32, first_id=1)
    cc = native.NativeBlockAllocator(32, first_id=1, prefix_caching=True)
    live = []   # (block_id, marked)
    for step in range(3000):
        op = rng.integers(0, 4)
        if op == 0 and py.get_num_free_blocks() > 0:
            a, b = py.allocate(), cc.allocate()
            assert a == b, f"step {step}"
            live.append([a, False])
        elif op == 1 and live:
            i, _ = live.pop(rng.integers(0, len(live)))
            py.free(i)
            cc.free(i)
        elif op == 2 and live:
            idx = rng.integers(0, len(live))
            i, marked = live[idx]
            if not marked:
                h = int(rng.integers(0, 50))
                r1 = py.mark_full(i, h, 16, py._now())
                r2 = cc.mark_full(i, h, 16)
                assert r1 == r2, f"step {step}"
                live[idx] = [r1, True]
                if rng.integers(0, 2):
                    py.mark_computed(r1)
                    cc.mark_computed(r1)
        else:
            h = int(rng.integers(0, 50))
            assert py.lookup(h) == cc.lookup(h), f"step {step}"
        assert py.get_num_free_blocks() == cc.get_num_free_blocks(), \
            f"step {step}"
