"""The generic Workflow-Defined LLMEngine.

Counterpart of the reference's engine (reference:
light_vllm/core/llm_engine.py:20-196). The engine itself knows nothing about
tasks: it lazy-imports the components named by the Workflow, wires them, and
runs the step pipeline

    scheduler.schedule() → model_inputs_builder → executor.execute_model
      → output_processor → scheduler.free_finished_request

Async scheduling keeps up to `max_num_on_the_fly` batches in flight through
queue-fed executor threads, overlapping host-side input building /
detokenization with device compute (XLA dispatch is already async; the window
hides the *host* latency).
"""

import queue
import time
from typing import Any, Dict, Iterable, List, Optional, Union

from light_vllm_tpu import envs
from light_vllm_tpu.core.schema.engine_io import Params, PromptType
from light_vllm_tpu.core.workflow import Workflow, lazy_import
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


class LLMEngine:

    def __init__(self, engine_config, workflow_cls,
                 tokenizer_override: Any = None) -> None:
        self.engine_config = engine_config
        self.engine_config.log_config()
        self.tokenizer_override = tokenizer_override
        self.workflow = workflow_cls.from_engine(self)

        self._maybe_init_async_scheduling()

        # Wiring order matters: later components may need earlier ones
        # (reference: light_vllm/core/llm_engine.py:30-46).
        self.attn_backend = self._build("AttnBackend")
        self.executor = self._build("Executor")
        self.tokenizer = self._build("Tokenizer")
        self.model_inputs_builder = self._build("ModelInputBuilder")
        if hasattr(self.executor, "initialize_kv_caches"):
            self.executor.initialize_kv_caches(self)
        self.input_processor = self._build("InputProcessor")
        self.request_processor = self._build("RequestProcessor")
        self.scheduler = self._build("Scheduler")
        self.output_processor = self._build("OutputProcessor")

        from light_vllm_tpu.core.metrics import (build_hooks_from_env,
                                                 enable_trace_function_call)
        self.stats_logger, self.profiler_hook = build_hooks_from_env()
        from light_vllm_tpu import envs
        if envs.LVT_TRACE_FUNCTION:
            enable_trace_function_call("lvt_engine_trace.log")

    def _build(self, component: str):
        qualname = getattr(self.workflow, component, "")
        if not qualname:
            return None
        cls = lazy_import(qualname)
        return cls.from_engine(self)

    def _maybe_init_async_scheduling(self) -> None:
        scheduling = getattr(self.engine_config.scheduler_config, "scheduling",
                             "sync")
        self.use_async_scheduling = scheduling in ("async", "simple_async",
                                                   "double_buffer")
        if self.use_async_scheduling:
            self.executor_in: "queue.Queue" = queue.Queue()
            self.executor_out: "queue.Queue" = queue.Queue()
            self.max_num_on_the_fly = getattr(
                self.engine_config.scheduler_config, "max_num_on_the_fly", 2)
            self.num_on_the_fly = 0
            self.step = self.async_step
        else:
            self.step = self.sync_step
        # Deferred-output decode chaining (decoding workflow, async mode):
        # pure-decode multi-step windows whose outputs no host decision
        # depends on are NOT pythonized before the next window is
        # dispatched — the worker chains the sampled tokens on device, so
        # the inter-invocation d2h round trip leaves the decode critical
        # path entirely. Windows queue here until values are needed.
        self._deferred: List = []
        self._drained_outputs: List = []
        self._chain_sig = None
        self._defer_count = 0  # windows deferred (stats/tests)

    # --- construction ------------------------------------------------------
    @classmethod
    def from_engine_args(cls, engine_args: Union[Dict[str, Any], Any],
                         tokenizer_override: Any = None) -> "LLMEngine":
        """Resolve model → workflow → config → engine."""
        if not isinstance(engine_args, dict):
            engine_args = engine_args.to_dict()

        from light_vllm_tpu.core.config import ModelConfig
        from light_vllm_tpu.core.registry import ModelRegistry

        model_config = ModelConfig(
            model=engine_args.get("model", ""),
            tokenizer=engine_args.get("tokenizer"),
            dtype=engine_args.get("dtype", "auto"),
            trust_remote_code=engine_args.get("trust_remote_code", False),
            revision=engine_args.get("revision"),
            max_model_len=engine_args.get("max_model_len"),
            quantization=engine_args.get("quantization"),
            hf_config=engine_args.get("hf_config"),
        )
        task, model_path, workflow_path = ModelRegistry.resolve(
            model_config.architectures)
        # `workflow=` engine-arg overrides the registry's workflow string
        # ("module.path:Class") — e.g. run a bare BertModel through
        # EncodeOnlyWorkflow for raw hidden states instead of the
        # retriever routing its architecture resolves to (reference
        # analog: the Workflow class plug points of
        # light_vllm/core/workflow.py:4-22).
        workflow_path = engine_args.get("workflow") or workflow_path
        workflow_cls = lazy_import(workflow_path)
        workflow_cls = workflow_cls.from_engine_args(engine_args)
        args_cls = lazy_import(workflow_cls.EngineArgs)
        known = {f.name for f in __import__("dataclasses").fields(args_cls)}
        args = args_cls(**{k: v for k, v in engine_args.items() if k in known})
        engine_config = args.create_engine_config()
        return cls(engine_config, workflow_cls,
                   tokenizer_override=tokenizer_override)

    # --- request lifecycle -------------------------------------------------
    def add_request(self, request_id: str, prompt: PromptType,
                    params: Optional[Params] = None,
                    arrival_time: Optional[float] = None) -> None:
        arrival_time = arrival_time or time.time()
        request = self.input_processor(request_id, prompt, params,
                                       arrival_time)
        self.scheduler.add_request(request)

    def abort_request(self, request_id: Union[str, Iterable[str]]) -> None:
        self.scheduler.abort_request(request_id)

    def has_unfinished_requests(self) -> bool:
        if self.use_async_scheduling and self.num_on_the_fly > 0:
            return True
        if self._drained_outputs:
            # Outputs already produced (deferred drain or ignored-only
            # batches) but not yet handed to the caller.
            return True
        return self.scheduler.has_unfinished_requests()

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_requests()

    # --- step loops --------------------------------------------------------
    def sync_step(self) -> List:
        self.scheduler.remove_abort_request()
        scheduler_output = self.scheduler.schedule()
        if scheduler_output.is_empty():
            return []
        if not scheduler_output.needs_execution():
            # Only ignored (over-length) requests: emit their finished
            # outputs without a model forward.
            request_outputs = self.output_processor(scheduler_output, None)
            self.scheduler.free_finished_request(scheduler_output)
            self._on_step_done(scheduler_output, request_outputs)
            return request_outputs
        execute_input = self.model_inputs_builder(scheduler_output)
        execute_output = self.executor.execute_model(execute_input)
        request_outputs = self.output_processor(scheduler_output,
                                                execute_output)
        self.scheduler.free_finished_request(scheduler_output)
        self._on_step_done(scheduler_output, request_outputs)
        return request_outputs

    def async_step(self) -> List:
        self.executor.ensure_start_execute_loop()
        self._put_as_many_as_possible()
        if self.num_on_the_fly == 0:
            return self._pop_drained()
        tag, item = self.executor_out.get(block=True)
        self.num_on_the_fly -= 1
        if isinstance(item, Exception):
            raise item
        scheduler_output = tag
        if self._defer_eligible(scheduler_output, item):
            starts = self.output_processor.advance_placeholders(
                scheduler_output, scheduler_output.multi_step)
            self.scheduler.free_finished_request(scheduler_output)
            self._deferred.append((scheduler_output, item, starts))
            self._defer_count += 1
            self._on_step_done(scheduler_output, [])
            self._put_as_many_as_possible()
            if len(self._deferred) >= envs.LVT_DEFER_MAX_WINDOWS:
                # Bound stream latency: with the next window already
                # dispatched, draining old rings costs ~nothing (their
                # readbacks started at their dispatch).
                self._drained_outputs.extend(self._drain_deferred())
            return self._pop_drained()
        prior = self._drain_deferred()
        request_outputs = self.output_processor(scheduler_output, item)
        self.scheduler.free_finished_request(scheduler_output)
        self._on_step_done(scheduler_output, request_outputs)
        # Refill the window with what just became schedulable.
        self._put_as_many_as_possible()
        return self._pop_drained() + prior + request_outputs

    def _on_step_done(self, scheduler_output, request_outputs) -> None:
        if self.stats_logger is not None:
            self.stats_logger.on_step(scheduler_output, request_outputs,
                                      self.scheduler)
        if self.profiler_hook is not None:
            self.profiler_hook.on_step()

    def _put_as_many_as_possible(self) -> None:
        while self.num_on_the_fly < self.max_num_on_the_fly:
            self.scheduler.remove_abort_request()
            scheduler_output = self.scheduler.schedule()
            if scheduler_output.is_empty():
                break
            if not scheduler_output.needs_execution():
                # Ignored-only batch: emit outputs inline, nothing to
                # dispatch to the executor.
                outs = self.output_processor(scheduler_output, None)
                self.scheduler.free_finished_request(scheduler_output)
                self._on_step_done(scheduler_output, outs)
                self._drained_outputs.extend(outs)
                continue
            sig = self._window_sig(scheduler_output)
            chain = sig is not None and sig == self._chain_sig
            if self._deferred and not chain:
                # The next batch is not a chained continuation: its input
                # blob needs real token ids — resolve placeholders first.
                self._drained_outputs.extend(self._drain_deferred())
            execute_input = self.model_inputs_builder(scheduler_output)
            if chain:
                execute_input.model_input.chain_tokens = True
                execute_input.model_input.chain_key = sig
            elif sig is not None:
                # First window of a potential chain: record its key for
                # the worker's ring cache.
                execute_input.model_input.chain_key = sig
            self._chain_sig = sig
            self.executor_in.put((scheduler_output, execute_input))
            self.num_on_the_fly += 1

    # --- deferred-output helpers ------------------------------------------
    def _pop_drained(self) -> List:
        outs, self._drained_outputs = self._drained_outputs, []
        return outs

    def _window_sig(self, scheduler_output):
        """Row-assignment signature of a pure-decode multi-step window
        (None = not chainable)."""
        if getattr(scheduler_output, "multi_step", 1) <= 1:
            return None
        metas = getattr(scheduler_output, "seq_group_metadata_list", None)
        if not metas or any(m.is_prompt for m in metas):
            return None
        return tuple((m.request_id, tuple(m.seq_data)) for m in metas)

    def _defer_eligible(self, scheduler_output, execute_output) -> bool:
        if not self.use_async_scheduling or not envs.LVT_DEFER_OUTPUTS:
            return False
        if getattr(self.engine_config.cache_config, "enable_prefix_caching",
                   False):
            return False  # block hashes need real token ids
        K = getattr(scheduler_output, "multi_step", 1)
        if K <= 1 or self._window_sig(scheduler_output) is None:
            return False
        ring = getattr(execute_output, "next_tokens", None)
        if ring is None or getattr(ring, "ndim", 0) != 3:
            return False
        if not hasattr(self.output_processor, "advance_placeholders"):
            return False
        max_len = self.engine_config.model_config.max_model_len
        for meta in scheduler_output.seq_group_metadata_list:
            sp = meta.sampling_params
            if (not sp.ignore_eos or sp.stop or sp.stop_token_ids
                    or sp.logprobs or sp.prompt_logprobs
                    or sp.logits_processors or sp.detokenize
                    or sp.n != 1 or sp.best_of != 1 or sp.min_tokens
                    or sp.presence_penalty or sp.frequency_penalty
                    or sp.repetition_penalty != 1.0
                    or sp.max_tokens is None):
                return False
            for sd in meta.seq_data.values():
                # no sequence may finish inside the deferred window
                if sd.get_output_len() + K >= sp.max_tokens:
                    return False
                if sd.get_len() + K >= max_len:
                    return False
        return True

    def _drain_deferred(self) -> List:
        if not self._deferred:
            return []
        outs: List = []
        for (so, eo, starts) in self._deferred:
            outs.extend(self.output_processor.backfill_deferred(
                so, eo, starts))
        self._deferred.clear()
        return outs

    def wait_for_precompile(self, timeout: Optional[float] = None) -> int:
        """Block until any background-compiling executables are live (no-op
        for workers without AOT precompile). See
        DecodingModelRunner.wait_for_precompile."""
        worker = getattr(getattr(self, "executor", None), "worker", None)
        fn = getattr(worker, "wait_for_precompile", None)
        return fn(timeout) if fn is not None else 0

    def shutdown(self) -> None:
        """Stop executor threads and release ALL device memory this engine
        holds (weights, KV pages) — a following engine in the same process
        gets the full HBM budget back."""
        if getattr(self, "profiler_hook", None) is not None:
            self.profiler_hook.close()
            self.profiler_hook = None
        executor = getattr(self, "executor", None)
        if executor is not None:
            executor.shutdown_execute_loop()
            workers = getattr(executor, "workers", None) \
                or [getattr(executor, "worker", None)]
            for w in workers:
                if w is not None:
                    try:
                        w.shutdown()
                    except Exception:  # noqa: BLE001 — best-effort free
                        logger.warning("worker shutdown failed",
                                       exc_info=True)
            self.executor = None

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass
