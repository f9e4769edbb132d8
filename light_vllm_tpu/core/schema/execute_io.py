"""Execution-side IO schemas.

Counterpart of the reference's ExecuteInput/ExecuteOutput
(reference: light_vllm/core/schema/execute_io.py:8-63), reshaped for JAX:
"to device" means building jnp arrays (optionally sharded over a Mesh), and
"to host" means jax.device_get on the small result leaves.
"""

from dataclasses import dataclass, field, fields
from typing import Any, Dict, Optional


@dataclass
class ModelInput:
    """Dense, padded arrays fed to the jitted model step.

    Subclasses hold numpy arrays host-side; `to_device()` converts every
    np.ndarray leaf to a jnp array (XLA transfers are async).
    """

    def to_device(self, sharding=None) -> "ModelInput":
        import jax
        import numpy as np

        kwargs: Dict[str, Any] = {}
        for f in fields(self):
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray):
                v = jax.device_put(v, sharding) if sharding is not None \
                    else jax.device_put(v)
            kwargs[f.name] = v
        return type(self)(**kwargs)

    def to_dict(self) -> Dict[str, Any]:
        return {f.name: getattr(self, f.name) for f in fields(self)}


@dataclass
class WorkerInput:
    """Host-side side-channel commands for the worker (swaps, copies)."""


@dataclass
class ExecuteInput:
    worker_input: Optional[WorkerInput] = None
    model_input: Optional[ModelInput] = None


@dataclass
class ExecuteOutput:
    """Device-resident results of one step, plus timing stamps.

    Leaves stay on device until the output processor pulls them; XLA async
    dispatch means construction returns immediately.
    """

    execute_begin_ts: Optional[float] = None
    execute_end_ts: Optional[float] = None

    def block_until_ready(self) -> None:
        import jax

        for f in fields(self):
            v = getattr(self, f.name)
            if hasattr(v, "block_until_ready"):
                v.block_until_ready()

    def start_readback(self) -> None:
        """Kick off async device→host copies of every device leaf.

        The output processor's np.asarray() otherwise pays the full d2h
        round-trip latency per step (dozens of ms over a remote-tunnel
        device, independent of the few-KB payload); starting the copy at
        dispatch time overlaps it with the step's device compute."""
        for f in fields(self):
            v = getattr(self, f.name)
            if hasattr(v, "copy_to_host_async"):
                try:
                    v.copy_to_host_async()
                except Exception:
                    return  # best-effort: some backends lack the fast path


@dataclass
class IntermediateTensors:
    """Hidden states handed across pipeline-parallel stage boundaries."""

    tensors: Dict[str, Any] = field(default_factory=dict)

    def __getitem__(self, key: str):
        return self.tensors[key]

    def __setitem__(self, key: str, value) -> None:
        self.tensors[key] = value
