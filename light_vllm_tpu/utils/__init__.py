"""Small shared utilities (reference: light_vllm/utils.py, re-imagined for JAX hosts)."""

import random
import time
from collections import OrderedDict
from typing import Any, Dict, Generic, Hashable, Iterable, List, Optional, TypeVar

import numpy as np

T = TypeVar("T")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


class Counter:
    """Monotonic id source (reference: light_vllm/utils.py:73)."""

    def __init__(self, start: int = 0) -> None:
        self.counter = start

    def __next__(self) -> int:
        i = self.counter
        self.counter += 1
        return i

    def reset(self) -> None:
        self.counter = 0


class LRUCache(Generic[T]):
    """Simple LRU with optional on-evict hook (reference: light_vllm/utils.py:87)."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.cache: "OrderedDict[Hashable, T]" = OrderedDict()

    def __contains__(self, key: Hashable) -> bool:
        return key in self.cache

    def __len__(self) -> int:
        return len(self.cache)

    def get(self, key: Hashable, default: Optional[T] = None) -> Optional[T]:
        if key in self.cache:
            self.cache.move_to_end(key)
            return self.cache[key]
        return default

    def put(self, key: Hashable, value: T) -> None:
        if key in self.cache:
            self.cache.move_to_end(key)
        self.cache[key] = value
        while len(self.cache) > self.capacity:
            self.cache.popitem(last=False)

    def pop(self, key: Hashable, default: Optional[T] = None) -> Optional[T]:
        return self.cache.pop(key, default)

    def clear(self) -> None:
        self.cache.clear()


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def make_ndarray_with_pad(
    x: List[List[int]],
    pad: int,
    dtype: Any,
    *,
    max_len: Optional[int] = None,
) -> np.ndarray:
    """Pad a ragged list-of-lists into a dense [len(x), max_len] ndarray."""
    if max_len is None:
        max_len = max((len(row) for row in x), default=0)
    out = np.full((len(x), max_len), pad, dtype=dtype)
    for i, row in enumerate(x):
        out[i, : len(row)] = row
    return out


def flatten_2d(lists: Iterable[Iterable[T]]) -> List[T]:
    return [item for sub in lists for item in sub]


class StopWatch:
    """Monotonic timer used by executors to stamp step begin/end times."""

    def __init__(self) -> None:
        self.begin = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.begin


def get_dtype_size(dtype: Any) -> int:
    """Byte size of a jnp/np dtype."""
    return np.dtype(dtype).itemsize if not hasattr(dtype, "dtype") else np.dtype(
        dtype.dtype).itemsize


def random_uuid() -> str:
    import uuid

    return str(uuid.uuid4().hex)
