"""Device-mesh construction for TP x DP sharding, single- and multi-host.

TPU-native replacement for the reference's distributed layer (reference:
light_vllm/distributed.py:18-56 FakeGroupCoordinator — identity collectives).
Here the collectives are real: weights and KV caches carry PartitionSpecs
over this mesh and XLA/GSPMD inserts all-gather/psum over ICI (and DCN for
the axes that cross hosts/slices).

Axis convention:
    "dp"  — data parallel (batch / request axis); spans DCN on multi-slice
            deployments (cheap: only per-batch activations cross hosts).
    "tp"  — tensor parallel (heads / hidden axis); kept inside one slice so
            its all-gathers/psums ride ICI, never DCN.

Multi-host entry: call `initialize_distributed()` (or export
LVT_COORDINATOR_ADDRESS / LVT_NUM_PROCESSES / LVT_PROCESS_ID) in every
process before engine construction; `build_mesh` then lays DP across slices
via jax's hybrid mesh helper.
"""

from typing import List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

_distributed_initialized = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks; idempotent.

    On Cloud TPU all three args auto-detect from the metadata server, so a
    bare call is correct there; the env vars cover manual clusters."""
    global _distributed_initialized
    if _distributed_initialized:
        return
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "LVT_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("LVT_NUM_PROCESSES"):
        num_processes = int(os.environ["LVT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("LVT_PROCESS_ID"):
        process_id = int(os.environ["LVT_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _distributed_initialized = True
    logger.info("jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count())


def _slice_id(d) -> int:
    """Group key for ICI connectivity: TPU slices expose slice_index; fall
    back to process_index (one host per slice on CPU/test platforms)."""
    s = getattr(d, "slice_index", None)
    if s is not None:
        return int(s)
    return int(getattr(d, "process_index", 0))


def build_mesh(tensor_parallel_size: int = 1, data_parallel_size: int = 1,
               devices: Optional[List] = None) -> Mesh:
    tp, dp = tensor_parallel_size, data_parallel_size
    if devices is None:
        devices = jax.devices()
    world = tp * dp
    if world > len(devices):
        raise ValueError(
            f"requested tp={tp} x dp={dp} = {world} devices but only "
            f"{len(devices)} available")

    slice_ids = sorted({_slice_id(d) for d in devices})
    n_slices = len(slice_ids)
    if n_slices > 1 and world == len(devices):
        # Multi-slice: DP crosses DCN, TP stays inside a slice.
        per_slice = len(devices) // n_slices
        if tp > per_slice:
            raise ValueError(
                f"tp={tp} exceeds slice size {per_slice}: tensor "
                f"parallelism must not cross DCN")
        if dp % n_slices != 0:
            raise ValueError(
                f"dp={dp} must be divisible by the number of slices "
                f"{n_slices} so each slice holds an equal DP shard")
        by_slice = {s: [] for s in slice_ids}
        for d in devices:
            by_slice[_slice_id(d)].append(d)
        # [n_slices, dp_per_slice, tp] → [dp, tp]; dp-major across slices.
        arr = np.stack([
            np.asarray(sorted(by_slice[s], key=lambda d: d.id)).reshape(
                dp // n_slices, tp)
            for s in slice_ids
        ]).reshape(dp, tp)
        logger.info("hybrid mesh: %d slices, dp=%d (DCN-major) x tp=%d (ICI)",
                    n_slices, dp, tp)
        return Mesh(arr, axis_names=("dp", "tp"))

    devices = np.asarray(devices[:world]).reshape(dp, tp)
    return Mesh(devices, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
