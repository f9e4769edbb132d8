"""Prefill-only workflow wiring (reference: light_vllm/prefill_only/workflow.py:4-43)."""

from light_vllm_tpu.core.workflow import Workflow


class PrefillOnlyWorkflow(Workflow):
    EngineArgs = "light_vllm_tpu.encode_only.arg_utils:EncodeOnlyEngineArgs"
    Scheduler = "light_vllm_tpu.prefill_only.scheduler:PrefillOnlyScheduler"
    AttnBackend = "light_vllm_tpu.prefill_only.attention:EncoderAttnBackend"
    InputProcessor = ("light_vllm_tpu.core.processor.input_processor:"
                      "TextInputProcessor")
    RequestProcessor = ("light_vllm_tpu.prefill_only.processor:"
                        "PrefillOnlyRequestProcessor")
    ModelInputBuilder = ("light_vllm_tpu.prefill_only.processor:"
                         "PrefillOnlyModelInputBuilder")
    Executor = "light_vllm_tpu.prefill_only.executor:PrefillOnlyExecutor"
    Worker = "light_vllm_tpu.prefill_only.worker:PrefillOnlyWorker"
    attn_type = "ENCODER"
    # On-device embedding reduction ("none" | "cls_norm" | "last_norm" |
    # "score") — see PrefillOnlyModelRunner. "none" keeps the raw
    # [B, L, H] hidden-states contract of the encode_only API.
    pooling = "none"

    @classmethod
    def from_engine(cls, engine):
        sc = engine.engine_config.scheduler_config
        pc = engine.engine_config.parallel_config
        cls = type(cls.__name__, (cls,), {})  # fresh subclass to mutate
        if getattr(pc, "data_parallel_size", 1) > 1:
            cls.Executor = ("light_vllm_tpu.prefill_only.executor:"
                            "PrefillOnlyDataParallelExecutor")
            # DP fleets want a deeper in-flight window
            # (reference: prefill_only/workflow.py:31-43).
            sc.scheduling = "async"
            sc.max_num_on_the_fly = max(
                sc.max_num_on_the_fly, 2 * pc.data_parallel_size)
        elif getattr(sc, "scheduling", "sync") != "sync":
            cls.Executor = ("light_vllm_tpu.prefill_only.executor:"
                            "PrefillOnlyAsyncExecutor")
        return cls
