"""Device-mesh construction for TP x DP sharding.

TPU-native replacement for the reference's distributed layer (reference:
light_vllm/distributed.py:18-56 FakeGroupCoordinator — identity collectives).
Here the collectives are real: weights and KV caches carry PartitionSpecs
over this mesh and XLA/GSPMD inserts all-gather/psum over ICI.

Axis convention:
    "dp"  — data parallel (batch / request axis); DCN on multi-host slices.
    "tp"  — tensor parallel (heads / hidden axis); ICI within a host.

jax.distributed.initialize() is the multi-host entry point; single-process
multi-chip (one host, 8 chips) works out of the box because jax.devices()
already lists every local chip.
"""

from typing import List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


def build_mesh(tensor_parallel_size: int = 1, data_parallel_size: int = 1,
               devices: Optional[List] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    world = tensor_parallel_size * data_parallel_size
    if world > len(devices):
        raise ValueError(
            f"requested tp={tensor_parallel_size} x dp={data_parallel_size}"
            f" = {world} devices but only {len(devices)} available")
    devices = np.asarray(devices[:world]).reshape(
        data_parallel_size, tensor_parallel_size)
    return Mesh(devices, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
