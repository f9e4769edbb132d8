"""ctypes bindings for the C++ host runtime (csrc/host_runtime.cpp).

Builds the shared library on first use (g++, ~1s) and caches it under
csrc/build/. Falls back silently to the pure-Python allocators when the
toolchain is unavailable (LVT_USE_NATIVE_RUNTIME=0 disables explicitly).
"""

import ctypes
import os
import subprocess
from typing import Optional

from light_vllm_tpu import envs
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "build", "libhost_runtime.so")

_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not envs.LVT_USE_NATIVE_RUNTIME:
        return None
    try:
        # Always invoke make: a no-op when up to date, and it rebuilds a
        # stale .so after source changes (the .so is not checked in).
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lvt_allocator_create.restype = ctypes.c_void_p
        lib.lvt_allocator_create.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                             ctypes.c_int32]
        lib.lvt_allocator_destroy.argtypes = [ctypes.c_void_p]
        lib.lvt_num_free.restype = ctypes.c_int32
        lib.lvt_num_free.argtypes = [ctypes.c_void_p]
        lib.lvt_allocate.restype = ctypes.c_int32
        lib.lvt_allocate.argtypes = [ctypes.c_void_p]
        lib.lvt_incr.restype = ctypes.c_int32
        lib.lvt_incr.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.lvt_refcount.restype = ctypes.c_int32
        lib.lvt_refcount.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.lvt_free.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.lvt_lookup.restype = ctypes.c_int32
        lib.lvt_lookup.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.lvt_touch.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.lvt_mark_computed.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.lvt_mark_full.restype = ctypes.c_int32
        lib.lvt_mark_full.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                      ctypes.c_int64, ctypes.c_int32]
        lib.lvt_stats.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        logger.debug("native host runtime loaded from %s", _LIB_PATH)
    except Exception as e:
        logger.warning("native host runtime unavailable (%s); "
                       "using pure-Python allocators", e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeBlockAllocator:
    """Drop-in replacement for NaiveBlockAllocator /
    PrefixCachingBlockAllocator backed by the C++ runtime."""

    def __init__(self, num_blocks: int, first_id: int = 1,
                 prefix_caching: bool = False) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime not available")
        self._lib = lib
        self.num_blocks = num_blocks
        self.prefix_caching = prefix_caching
        self._h = lib.lvt_allocator_create(num_blocks, first_id,
                                           1 if prefix_caching else 0)

    def __del__(self):
        try:
            self._lib.lvt_allocator_destroy(self._h)
        except Exception:
            pass

    def get_num_free_blocks(self) -> int:
        return self._lib.lvt_num_free(self._h)

    def allocate(self, content_hash=None, num_hashed_tokens: int = 0) -> int:
        bid = self._lib.lvt_allocate(self._h)
        if bid < 0:
            raise RuntimeError("out of KV blocks")
        return bid

    def incr(self, block_id: int) -> int:
        return self._lib.lvt_incr(self._h, block_id)

    def free(self, block_id: int) -> None:
        self._lib.lvt_free(self._h, block_id)

    def get_refcount(self, block_id: int) -> int:
        return self._lib.lvt_refcount(self._h, block_id)

    def lookup(self, content_hash: int):
        bid = self._lib.lvt_lookup(self._h, ctypes.c_int64(
            content_hash & 0x7FFFFFFFFFFFFFFF))
        return None if bid < 0 else bid

    def touch(self, block_id: int, now: int = 0) -> None:
        self._lib.lvt_touch(self._h, block_id)

    def mark_computed(self, block_id: int) -> None:
        self._lib.lvt_mark_computed(self._h, block_id)

    def mark_full(self, block_id: int, content_hash: int,
                  num_hashed_tokens: int, now: int = 0) -> int:
        return self._lib.lvt_mark_full(
            self._h, block_id,
            ctypes.c_int64(content_hash & 0x7FFFFFFFFFFFFFFF),
            num_hashed_tokens)

    @property
    def hits(self) -> int:
        h, m = ctypes.c_int64(), ctypes.c_int64()
        self._lib.lvt_stats(self._h, ctypes.byref(h), ctypes.byref(m))
        return h.value

    @property
    def misses(self) -> int:
        h, m = ctypes.c_int64(), ctypes.c_int64()
        self._lib.lvt_stats(self._h, ctypes.byref(h), ctypes.byref(m))
        return m.value

    # hash_of compatibility view (used by append_slots promotion check)
    @property
    def hash_of(self):
        return _NativeHashView(self)


class _NativeHashView:
    """Minimal mapping view: only .get(bid) is used by the block manager to
    decide re-promotion; the native side dedupes anyway, so a conservative
    None keeps behavior correct (mark_full is idempotent)."""

    def __init__(self, alloc: NativeBlockAllocator) -> None:
        self.alloc = alloc

    def get(self, block_id, default=None):
        return default
