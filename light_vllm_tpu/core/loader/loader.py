"""Model loaders: default (safetensors/bin), dummy (random), state-dict.

Counterpart of the reference's loader stack (reference:
light_vllm/core/loader/loader.py:102-624). The JAX twist: models consume a
host-side (name, np.ndarray) stream into a numpy params pytree (doing merge /
transpose / stacking on host), then the loader places every leaf on device
with the sharding its ParamSpec declares — a sharded device_put, so each TP
shard only materializes its slice.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from light_vllm_tpu.core.config import LoadConfig
from light_vllm_tpu.layers.base import ParamSpec
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _place(params_np: Any, specs: Any, mesh) -> Any:
    """device_put every numpy leaf with its declared sharding, casting to the
    spec dtype. Works leaf-wise so huge models stream through host RAM."""

    def one(arr, spec: ParamSpec):
        if arr is None:
            raise ValueError("missing parameter for spec " + repr(spec))
        target_dtype = spec.dtype
        arr = np.asarray(arr)
        if tuple(arr.shape) != tuple(spec.shape):
            # Pad (e.g. vocab padding) — only trailing growth on axis 0/1.
            pads = [(0, s - a) for a, s in zip(arr.shape, spec.shape)]
            if any(p[1] < 0 for p in pads):
                raise ValueError(
                    f"shape mismatch: got {arr.shape}, want {spec.shape}")
            arr = np.pad(arr, pads)
        x = jnp.asarray(arr, dtype=target_dtype)
        if mesh is not None:
            x = jax.device_put(x, NamedSharding(mesh, spec.pspec))
        return x

    return jax.tree.map(one, params_np, specs,
                        is_leaf=lambda x: x is None or isinstance(
                            x, (np.ndarray, jnp.ndarray)))


def _apply_quantize_hooks(layer_tree: Any, params: Any) -> Any:
    """Walk the layer tree next to the raw params; let layers that expect a
    quantized format quantize their float kernels host-side."""
    from light_vllm_tpu.layers.base import Layer

    if isinstance(layer_tree, Layer):
        if hasattr(layer_tree, "maybe_quantize"):
            return layer_tree.maybe_quantize(params)
        return params
    if isinstance(layer_tree, dict):
        return {k: (_apply_quantize_hooks(layer_tree[k], v)
                    if k in layer_tree else v)
                for k, v in params.items()}
    if isinstance(layer_tree, (list, tuple)):
        return [_apply_quantize_hooks(lt, p)
                for lt, p in zip(layer_tree, params)]
    return params


def _apply_manual_tp_shuffle(layer_tree: Any, params: Any, tp: int) -> Any:
    """Permute merged column-parallel kernels for manual-TP shard layout
    (see MergedColumnParallelLinear.shuffle_for_manual_tp)."""
    from light_vllm_tpu.layers.base import Layer
    from light_vllm_tpu.layers.linear import MergedColumnParallelLinear

    if isinstance(layer_tree, MergedColumnParallelLinear):
        return layer_tree.shuffle_for_manual_tp(params, tp)
    if isinstance(layer_tree, Layer):
        return params
    if isinstance(layer_tree, dict):
        return {k: (_apply_manual_tp_shuffle(layer_tree[k], v, tp)
                    if k in layer_tree else v)
                for k, v in params.items()}
    if isinstance(layer_tree, (list, tuple)):
        return [_apply_manual_tp_shuffle(lt, p, tp)
                for lt, p in zip(layer_tree, params)]
    return params


class BaseModelLoader:

    def __init__(self, load_config: LoadConfig) -> None:
        self.load_config = load_config

    def load_params(self, model, engine_config, mesh=None, manual_tp=1):
        raise NotImplementedError

    def _finalize(self, model, params_np, mesh, manual_tp=1):
        if hasattr(model, "layer_tree"):
            params_np = _apply_quantize_hooks(model.layer_tree(), params_np)
            if manual_tp > 1:
                params_np = _apply_manual_tp_shuffle(
                    model.layer_tree(), params_np, manual_tp)
        if getattr(model, "scan_layers", False) and \
                isinstance(params_np.get("layers"), (list, tuple)):
            # Scan-over-layers models consume stacked [L, ...] params;
            # stack on host so the sharded device_put below places each
            # leaf exactly once.
            from light_vllm_tpu.layers.base import stack_layer_params

            params_np = dict(params_np)
            params_np["layers"] = stack_layer_params(params_np["layers"],
                                                     np_stack=True)
        return _place(params_np, model.specs(), mesh)


class DefaultModelLoader(BaseModelLoader):
    """Stream safetensors/bin shards → model.load_weights → sharded arrays
    (reference: loader.py:141 DefaultModelLoader)."""

    def load_params(self, model, engine_config, mesh=None, manual_tp=1):
        from light_vllm_tpu.core.loader.hf_utils import (
            pt_weights_iterator, resolve_weight_files,
            safetensors_weights_iterator)

        model_path = engine_config.model_config.model
        files = resolve_weight_files(model_path)
        if files[0].endswith(".safetensors"):
            it = safetensors_weights_iterator(files)
        else:
            it = pt_weights_iterator(files)
        params_np = model.load_weights(it)
        return self._finalize(model, params_np, mesh, manual_tp)


class NpCacheModelLoader(DefaultModelLoader):
    """load_format="np_cache": first load converts the checkpoint shards to
    one mmap-able .npy per tensor; later loads stream from the cache
    without re-parsing safetensors/pickle (reference:
    core/loader/weight_utils.py:58-69 np-cache iterator). Population is
    guarded by an exclusive flock so concurrent engine processes convert
    once (reference: weight_utils.py:329 lock around downloads)."""

    def load_params(self, model, engine_config, mesh=None, manual_tp=1):
        import contextlib
        import json
        import os

        model_path = engine_config.model_config.model
        cache_dir = os.path.join(model_path, "np_cache")
        manifest_path = os.path.join(cache_dir, "manifest.json")
        os.makedirs(cache_dir, exist_ok=True)

        @contextlib.contextmanager
        def locked():
            import fcntl

            with open(os.path.join(cache_dir, ".lock"), "w") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lf, fcntl.LOCK_UN)

        with locked():
            if not os.path.exists(manifest_path):
                logger.info("populating np cache at %s", cache_dir)
                from light_vllm_tpu.core.loader.hf_utils import (
                    pt_weights_iterator, resolve_weight_files,
                    safetensors_weights_iterator)

                files = resolve_weight_files(model_path)
                it = (safetensors_weights_iterator(files)
                      if files[0].endswith(".safetensors")
                      else pt_weights_iterator(files))
                names = []
                for i, (name, arr) in enumerate(it):
                    np.save(os.path.join(cache_dir, f"{i}.npy"),
                            np.asarray(arr), allow_pickle=False)
                    names.append(name)
                tmp = manifest_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(names, f)
                os.replace(tmp, manifest_path)  # atomic publish

        with open(manifest_path) as f:
            names = json.load(f)

        def cached_iter():
            for i, name in enumerate(names):
                yield name, np.load(os.path.join(cache_dir, f"{i}.npy"),
                                    mmap_mode="r")

        params_np = model.load_weights(cached_iter())
        return self._finalize(model, params_np, mesh, manual_tp)


class DummyModelLoader(BaseModelLoader):
    """Random init at full shape — profiling and benchmarks without
    checkpoints (reference: loader.py:294 DummyModelLoader)."""

    def load_params(self, model, engine_config, mesh=None, manual_tp=1):
        # random init: a column permutation of i.i.d. random weights is
        # identically distributed, so no shuffle is needed for manual TP
        seed = getattr(engine_config.model_config, "seed", 0)
        key = jax.random.PRNGKey(seed)
        specs = model.specs()
        if mesh is None:
            # One jitted init = one compile + one dispatch; eager per-param
            # init is hundreds of round-trips (brutal on remote devices).
            return jax.jit(model.init_params)(key)

        # Initialize directly sharded: jit the init so each shard
        # materializes only its slice.
        from light_vllm_tpu.layers.base import specs_to_shardings

        shardings = specs_to_shardings(specs, mesh)
        init_fn = jax.jit(model.init_params,
                          out_shardings=shardings)
        return init_fn(key)


class StateDictLoader(BaseModelLoader):
    """In-memory state dict (offline tests; reference analog is the HfRunner
    comparison path in tests)."""

    def load_params(self, model, engine_config, mesh=None, manual_tp=1):
        from light_vllm_tpu.core.loader.hf_utils import state_dict_iterator

        params_np = model.load_weights(
            state_dict_iterator(self.load_config.state_dict))
        return self._finalize(model, params_np, mesh, manual_tp)


def get_model_loader(load_config: LoadConfig) -> BaseModelLoader:
    fmt = load_config.load_format
    if load_config.state_dict is not None or fmt == "hf_state_dict":
        return StateDictLoader(load_config)
    if fmt == "dummy":
        return DummyModelLoader(load_config)
    if fmt == "np_cache":
        return NpCacheModelLoader(load_config)
    if fmt == "bitsandbytes":
        raise ValueError(
            "bitsandbytes checkpoints are CUDA-kernel-specific; on TPU "
            "use quantization='int8'/'int4' with a GPTQ/AWQ checkpoint "
            "(layers/quant/ingest.py) instead")
    return DefaultModelLoader(load_config)
