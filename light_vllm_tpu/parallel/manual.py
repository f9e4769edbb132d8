"""Manual-SPMD tensor-parallel context.

Under tp>1 the decoding runner wraps the whole model forward in ONE
`shard_map` over the device mesh (decoding/worker.py `_forward`), because
`pallas_call` is opaque to GSPMD: the stacked Pallas matmuls
(ops/stacked_matmul_pallas.py) and the paged-attention kernels can only be
partitioned by running them per-shard on locally-sharded operands — the
classic manual-collectives TP of the reference's Column/RowParallelLinear
(reference: light_vllm/backends/linear.py:255,698), except the collectives
here are `jax.lax.psum` / `all_gather` over a named mesh axis instead of
NCCL group calls.

While the shard_map body traces, this context is active; layers consult it
to switch to per-shard semantics:

  - RowParallelLinear / FusedMoE psum their partial outputs over the axis
  - QKVParallelLinear.split_qkv splits at LOCAL head counts
  - VocabParallelEmbedding does a masked local lookup + psum
  - ParallelLMHead all-gathers its local vocab-shard logits
  - Attention skips its own (nested) shard_map and calls the backend on
    the already-local shard

Thread-local because executable tracing happens concurrently on the AOT
precompile pool threads (decoding/worker.py `precompile`).
"""

import threading
from contextlib import contextmanager

_tls = threading.local()


@contextmanager
def manual_tp(tp_size: int, axis: str = "tp"):
    prev = getattr(_tls, "ctx", None)
    _tls.ctx = (int(tp_size), axis)
    try:
        yield
    finally:
        _tls.ctx = prev


def manual_tp_size() -> int:
    """Shard count of the active manual-TP region; 1 when inactive."""
    ctx = getattr(_tls, "ctx", None)
    return ctx[0] if ctx else 1


def manual_tp_axis() -> str:
    ctx = getattr(_tls, "ctx", None)
    return ctx[1] if ctx else "tp"
