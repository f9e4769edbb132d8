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
        return self.scheduler.has_unfinished_requests()

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_requests()

    # --- step loops --------------------------------------------------------
    def sync_step(self) -> List:
        self.scheduler.remove_abort_request()
        scheduler_output = self.scheduler.schedule()
        if scheduler_output.is_empty():
            return []
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
            return []
        tag, item = self.executor_out.get(block=True)
        self.num_on_the_fly -= 1
        if isinstance(item, Exception):
            raise item
        scheduler_output = tag
        request_outputs = self.output_processor(scheduler_output, item)
        self.scheduler.free_finished_request(scheduler_output)
        self._on_step_done(scheduler_output, request_outputs)
        # Refill the window with what just became schedulable.
        self._put_as_many_as_possible()
        return request_outputs

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
            execute_input = self.model_inputs_builder(scheduler_output)
            self.executor_in.put((scheduler_output, execute_input))
            self.num_on_the_fly += 1

    def shutdown(self) -> None:
        if getattr(self, "profiler_hook", None) is not None:
            self.profiler_hook.close()
        if getattr(self, "executor", None) is not None:
            self.executor.shutdown_execute_loop()

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass
