"""Decoding (chat) workflow wiring (reference: light_vllm/decoding/workflow.py:4-33)."""

from light_vllm_tpu.core.workflow import Workflow


class DecodingWorkflow(Workflow):
    EngineArgs = "light_vllm_tpu.decoding.arg_utils:DecodingEngineArgs"
    Scheduler = "light_vllm_tpu.decoding.scheduler:DecodingScheduler"
    AttnBackend = "light_vllm_tpu.decoding.attention:PagedAttnBackend"
    InputProcessor = ("light_vllm_tpu.core.processor.input_processor:"
                      "TextInputProcessor")
    RequestProcessor = ("light_vllm_tpu.decoding.processor:"
                        "DecodingRequestProcessor")
    ModelInputBuilder = ("light_vllm_tpu.decoding.processor:"
                         "DecodingModelInputBuilder")
    OutputProcessor = ("light_vllm_tpu.decoding.output_processor:"
                       "DecodingOutputProcessor")
    Executor = "light_vllm_tpu.decoding.executor:DecodingExecutor"
    Worker = "light_vllm_tpu.decoding.worker:DecodingWorker"
    attn_type = "DECODER"

    @classmethod
    def from_engine(cls, engine):
        sc = engine.engine_config.scheduler_config
        cls = type(cls.__name__, (cls,), {})
        scheduling = getattr(sc, "scheduling", "sync")
        if scheduling == "double_buffer":
            cls.Executor = ("light_vllm_tpu.decoding.executor:"
                            "DecodingDoubleBufferExecutor")
        elif scheduling != "sync":
            cls.Executor = ("light_vllm_tpu.decoding.executor:"
                            "DecodingAsyncExecutor")
        return cls
