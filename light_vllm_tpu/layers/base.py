"""Functional layer base: parameter specs with sharding, init, and loading.

This replaces the reference's torch.nn.Module layer stack (reference:
light_vllm/backends/linear.py etc.) with a JAX-native design: a layer is a
lightweight Python object that (a) declares its parameters as ParamSpecs —
shape, dtype, and a jax.sharding.PartitionSpec — and (b) provides a pure
`__call__(params, ...)`. Parameters live in plain nested dicts (pytrees), so
the whole model step jits and shards with pjit/GSPMD without any tracing of
module state.

TP is expressed *declaratively*: a ColumnParallel weight carries
PartitionSpec(None, "tp"); XLA's sharding propagation inserts the collectives
the reference's FakeGroupCoordinator stubbed out (reference:
light_vllm/distributed.py:18-56 — identity all_reduce; here they are real).
"""

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

Params = Dict[str, Any]


@dataclass
class ParamSpec:
    shape: Tuple[int, ...]
    dtype: Any
    pspec: P = field(default_factory=P)
    # Optional custom initializer (key, shape, dtype) -> array.
    init: Optional[Callable] = None


@dataclass
class StackedKernelRef:
    """A layer-indexed view into a stacked [L, K, N] weight — handed to
    linear layers under scan-over-layers instead of a sliced array.

    XLA's dynamic-slice of a weight stack inside the scanned decode step
    is re-executed by HLO rematerialization (measured ~18 ms/step vs the
    ~3 ms weight-read roofline on the 1.5B bench model); the Pallas
    stacked matmul (ops/stacked_matmul_pallas.py) instead reads weight
    tiles straight from the stack with the layer index scalar-prefetched,
    so no slice ever exists for XLA to rematerialize."""

    stack: jnp.ndarray   # [L, K, N]
    layer_idx: Any       # traced scalar i32


class Layer:
    """Base class; subclasses set self._specs: Dict[str, ParamSpec]."""

    def __init__(self) -> None:
        self._specs: Dict[str, ParamSpec] = {}

    def specs(self) -> Dict[str, ParamSpec]:
        return self._specs

    def init_params(self, key: jax.Array, scale: float = 0.02) -> Params:
        """Random ("dummy-loader") initialization for tests and profiling
        (reference: light_vllm/core/loader/loader.py:294 DummyModelLoader)."""
        params: Params = {}
        keys = jax.random.split(key, max(len(self._specs), 1))
        for (name, spec), k in zip(self._specs.items(), keys):
            if spec.init is not None:
                params[name] = spec.init(k, spec.shape, spec.dtype)
            elif np.issubdtype(np.dtype(jnp.dtype(spec.dtype)), np.floating) \
                    or jnp.dtype(spec.dtype) in (jnp.bfloat16,):
                params[name] = (scale * jax.random.normal(
                    k, spec.shape, jnp.float32)).astype(spec.dtype)
            else:
                params[name] = jnp.zeros(spec.shape, spec.dtype)
        return params


def tree_specs(layer_tree: Any) -> Any:
    """Map a nested structure of Layers → nested dict of ParamSpecs."""
    if isinstance(layer_tree, Layer):
        return layer_tree.specs()
    if isinstance(layer_tree, dict):
        return {k: tree_specs(v) for k, v in layer_tree.items()}
    if isinstance(layer_tree, (list, tuple)):
        return [tree_specs(v) for v in layer_tree]
    raise TypeError(type(layer_tree))


def stack_layer_specs(spec_list: Any) -> Any:
    """[per-layer spec tree, ...] (identical structure/shapes) → one spec
    tree with a leading num_layers axis, replicated over the mesh
    (PartitionSpec gains a leading None). Used by scan-over-layers models:
    params stacked this way feed lax.scan so one executable holds a single
    layer body instead of num_layers unrolled copies."""
    L = len(spec_list)

    def one(*specs: ParamSpec) -> ParamSpec:
        s = specs[0]
        for other in specs[1:]:
            if tuple(other.shape) != tuple(s.shape) or \
                    other.dtype != s.dtype:
                raise ValueError(
                    "stack_layer_specs requires homogeneous layers: "
                    f"{other.shape}/{other.dtype} vs {s.shape}/{s.dtype}")
        return ParamSpec((L,) + tuple(s.shape), s.dtype, P(None, *s.pspec))

    return jax.tree.map(one, *spec_list,
                        is_leaf=lambda x: isinstance(x, ParamSpec))


def stack_layer_params(layer_params: Any, np_stack: bool = False) -> Any:
    """List of per-layer param trees → tree of [L, ...] stacked leaves."""
    stack = np.stack if np_stack else jnp.stack
    return jax.tree.map(lambda *xs: stack(xs), *layer_params)


def specs_to_shardings(specs: Any, mesh) -> Any:
    """ParamSpec tree → NamedSharding tree for jit in_shardings."""
    from jax.sharding import NamedSharding

    def one(s: ParamSpec):
        return NamedSharding(mesh, s.pspec)

    return jax.tree.map(one, specs,
                        is_leaf=lambda x: isinstance(x, ParamSpec))


def specs_to_shape_dtype(specs: Any) -> Any:
    def one(s: ParamSpec):
        return jax.ShapeDtypeStruct(s.shape, s.dtype)

    return jax.tree.map(one, specs,
                        is_leaf=lambda x: isinstance(x, ParamSpec))
