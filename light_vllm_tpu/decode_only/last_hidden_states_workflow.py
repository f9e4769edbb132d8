"""Decoder-as-embedder workflow: runs a causal LM on the prefill-only stack
and returns last-token hidden states (reference:
light_vllm/decode_only/output_last_hidden_states/workflow.py:5-26).

`enable_bidirectional` flips the attention to ENCODER for models trained
with bidirectional pooling (gte-Qwen2 hack, reference:
light_vllm/retriever/modelzoo/gte_qwen/workflow.py:6-21).
"""

from light_vllm_tpu.prefill_only.workflow import PrefillOnlyWorkflow


class DecodeOnlyLastHiddenStatesWorkflow(PrefillOnlyWorkflow):
    OutputProcessor = ("light_vllm_tpu.decode_only.output_processor:"
                       "LastHiddenStatesOutputProcessor")
    Worker = ("light_vllm_tpu.decode_only.worker:"
              "DecodeOnlyEncoderWorker")
    attn_type = "DECODER"
    pooling = "last_norm"

    @classmethod
    def from_engine_args(cls, engine_args: dict):
        cls = type(cls.__name__, (cls,), {})
        if engine_args.get("enable_bidirectional"):
            cls.attn_type = "ENCODER"
        return cls
