"""Prefill-only worker + runner: stateless encoder forward on TPU.

(reference: light_vllm/prefill_only/worker/gpu_worker.py:16-78,
light_vllm/prefill_only/runner/model_runner.py:16-61)

The worker owns the params (device-resident, sharded over the mesh) and a
jitted forward. No KV cache. XLA's shape-keyed jit cache plays the role of
the bucketed executable set; the input builder guarantees bucketed shapes so
the cache stays small.
"""

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from light_vllm_tpu.core.schema.execute_io import ExecuteInput
from light_vllm_tpu.core.worker import WorkerBase
from light_vllm_tpu.logger import init_logger
from light_vllm_tpu.prefill_only.schema import PrefillOnlyExecuteOutput
from light_vllm_tpu.parallel.mesh import build_mesh

logger = init_logger(__name__)


class PrefillOnlyModelRunner:
    """Wraps the pure model forward in jit (reference: prefill_only
    ModelRunner.execute_model = model(**inputs)).

    `pooling` moves the embedding reduction INTO the jitted forward so only
    a [B, H] float32 block crosses the device link instead of [B, L, H]
    (the r4 encode leg spent ~20 of its 25 s shipping full hidden states to
    host — see PrefillOnlyExecuteOutput.dense_vecs):
      - "none":      raw hidden states returned (encode_only API contract)
      - "cls_norm":  L2-normalized CLS vector (BGE-M3 dense retrieval)
      - "last_norm": L2-normalized last-real-token vector (decoder-as-
                     embedder, gte-Qwen style)
      - "score":     model-computed pooled_output only (cross-encoder
                     reranker scalar scores)
    """

    def __init__(self, model, mesh=None, pooling: str = "none") -> None:
        self.model = model
        self.mesh = mesh
        self.pooling = pooling
        self._jit_forward = None
        # DP-fleet workers pin a non-default chip: inputs must follow the
        # params there (jnp.asarray would land them on device 0).
        self._device = None
        if mesh is not None and mesh.devices.size == 1:
            dev = mesh.devices.flat[0]
            import jax as _jax
            if dev != _jax.devices()[0]:
                self._device = dev

    def prepare(self, params) -> None:
        self.params = params
        pooling = self.pooling

        def fwd(params, input_ids, positions, mask, token_type_ids,
                seq_lens):
            out = self.model(params, input_ids, positions, mask,
                             token_type_ids=token_type_ids)
            hidden = out["hidden_states"] if isinstance(out, dict) else out
            pooled = out.get("pooled_output") if isinstance(out, dict) \
                else None
            if pooling == "none":
                return {"hidden_states": hidden, "pooled_output": pooled}
            if pooling == "score":
                return {"pooled_output": pooled}
            if pooling == "cls_norm":
                vec = hidden[:, 0].astype(jnp.float32)
            elif pooling == "last_norm":
                L = hidden.shape[1]
                idx = jnp.clip(seq_lens - 1, 0, L - 1)  # [Bp], padded
                vec = jnp.take_along_axis(
                    hidden, idx[:, None, None], axis=1)[:, 0]
                vec = vec.astype(jnp.float32)
            else:
                raise ValueError(f"unknown pooling {pooling!r}")
            norms = jnp.linalg.norm(vec, axis=-1, keepdims=True)
            return {"dense_vecs": vec / jnp.maximum(norms, 1e-12)}

        self._jit_forward = jax.jit(fwd)

    def _to_dev(self, x):
        if self._device is not None:
            return jax.device_put(x, self._device)
        return jnp.asarray(x)

    def execute_model(self, model_input) -> Dict[str, Any]:
        ids = self._to_dev(model_input.input_ids)
        tti = model_input.token_type_ids
        tti = jnp.zeros_like(ids) if tti is None else self._to_dev(tti)
        mask = self._to_dev(model_input.mask)
        seq_lens = model_input.seq_lens
        if seq_lens is None:
            seq_lens = jnp.sum(mask, axis=-1, dtype=jnp.int32)
        else:
            seq_lens = self._to_dev(seq_lens)
        out = self._jit_forward(self.params, ids,
                                self._to_dev(model_input.positions),
                                mask, tti, seq_lens)
        return out


class PrefillOnlyWorker(WorkerBase):

    def __init__(self, engine_config, attn_backend=None,
                 model_cls=None, pooling: str = "none") -> None:
        self.engine_config = engine_config
        self.attn_backend = attn_backend
        self.model_cls = model_cls
        self.pooling = pooling
        self.mesh = None
        self.runner: Optional[PrefillOnlyModelRunner] = None

    @classmethod
    def from_engine(cls, engine) -> "PrefillOnlyWorker":
        from light_vllm_tpu.core.registry import ModelRegistry
        from light_vllm_tpu.core.workflow import lazy_import

        model_path = ModelRegistry.get_model_path(
            engine.engine_config.model_config.architectures)
        model_cls = lazy_import(model_path)
        worker = cls(engine.engine_config, engine.attn_backend, model_cls,
                     pooling=getattr(engine.workflow, "pooling", "none"))
        worker.init_device()
        worker.load_model()
        return worker

    @classmethod
    def from_engine_with_device(cls, engine, device) -> "PrefillOnlyWorker":
        """One DP-fleet worker pinned to a single chip: a 1-device Mesh
        replaces the reference's per-thread CUDA_VISIBLE_DEVICES
        (reference: prefill_only/executor/gpu_data_parallelism_executor.py:
        30-44)."""
        from light_vllm_tpu.core.registry import ModelRegistry
        from light_vllm_tpu.core.workflow import lazy_import

        model_path = ModelRegistry.get_model_path(
            engine.engine_config.model_config.architectures)
        model_cls = lazy_import(model_path)
        worker = cls(engine.engine_config, engine.attn_backend, model_cls,
                     pooling=getattr(engine.workflow, "pooling", "none"))
        worker.mesh = build_mesh(tensor_parallel_size=1,
                                 data_parallel_size=1, devices=[device])
        worker.load_model()
        return worker

    def init_device(self) -> None:
        pc = self.engine_config.parallel_config
        self.mesh = build_mesh(tensor_parallel_size=pc.tensor_parallel_size,
                               data_parallel_size=pc.data_parallel_size)

    def load_model(self) -> None:
        from light_vllm_tpu.core.loader.loader import get_model_loader

        t0 = time.perf_counter()
        model = self.model_cls(self.engine_config.model_config,
                               attn_backend=self.attn_backend)
        loader = get_model_loader(self.engine_config.load_config)
        params = loader.load_params(model, self.engine_config, self.mesh)
        self.runner = PrefillOnlyModelRunner(model, self.mesh,
                                             pooling=self.pooling)
        self.runner.prepare(params)
        logger.info("model loaded in %.1fs", time.perf_counter() - t0)

    def __call__(self, execute_input: ExecuteInput) -> PrefillOnlyExecuteOutput:
        begin = time.perf_counter()
        out = self.runner.execute_model(execute_input.model_input)
        return PrefillOnlyExecuteOutput(
            hidden_states=out.get("hidden_states"),
            pooled_output=out.get("pooled_output"),
            dense_vecs=out.get("dense_vecs"),
            execute_begin_ts=begin, execute_end_ts=time.perf_counter())

    def shutdown(self) -> None:
        """Eagerly free the weights' HBM (see DecodingWorker.shutdown)."""
        import jax

        if self.runner is not None:
            for leaf in jax.tree.leaves(self.runner.params):
                if isinstance(leaf, jax.Array):
                    try:
                        leaf.delete()
                    except Exception:  # noqa: BLE001
                        pass
            self.runner.params = None
            self.runner = None
