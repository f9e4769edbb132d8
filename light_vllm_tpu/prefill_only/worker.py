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
    ModelRunner.execute_model = model(**inputs))."""

    def __init__(self, model, mesh=None) -> None:
        self.model = model
        self.mesh = mesh
        self._jit_forward = None

    def prepare(self, params) -> None:
        self.params = params

        def fwd(params, input_ids, positions, mask, token_type_ids):
            return self.model(params, input_ids, positions, mask,
                              token_type_ids=token_type_ids)

        self._jit_forward = jax.jit(fwd)

    def execute_model(self, model_input) -> Dict[str, Any]:
        tti = model_input.token_type_ids
        if tti is None:
            tti = jnp.zeros_like(jnp.asarray(model_input.input_ids))
        out = self._jit_forward(self.params,
                                jnp.asarray(model_input.input_ids),
                                jnp.asarray(model_input.positions),
                                jnp.asarray(model_input.mask),
                                tti)
        return out


class PrefillOnlyWorker(WorkerBase):

    def __init__(self, engine_config, attn_backend=None,
                 model_cls=None) -> None:
        self.engine_config = engine_config
        self.attn_backend = attn_backend
        self.model_cls = model_cls
        self.mesh = None
        self.runner: Optional[PrefillOnlyModelRunner] = None

    @classmethod
    def from_engine(cls, engine) -> "PrefillOnlyWorker":
        from light_vllm_tpu.core.registry import ModelRegistry
        from light_vllm_tpu.core.workflow import lazy_import

        model_path = ModelRegistry.get_model_path(
            engine.engine_config.model_config.architectures)
        model_cls = lazy_import(model_path)
        worker = cls(engine.engine_config, engine.attn_backend, model_cls)
        worker.init_device()
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
        self.runner = PrefillOnlyModelRunner(model, self.mesh)
        self.runner.prepare(params)
        logger.info("model loaded in %.1fs", time.perf_counter() - t0)

    def __call__(self, execute_input: ExecuteInput) -> PrefillOnlyExecuteOutput:
        begin = time.perf_counter()
        out = self.runner.execute_model(execute_input.model_input)
        hidden = out["hidden_states"] if isinstance(out, dict) else out
        pooled = out.get("pooled_output") if isinstance(out, dict) else None
        return PrefillOnlyExecuteOutput(
            hidden_states=hidden, pooled_output=pooled,
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
