"""Decode-only workflow dispatcher (reference:
light_vllm/decode_only/workflow.py:9-16): chat decoding by default; flips to
the prefill-only stack when the request is decoder-as-embedder
("output_last_hidden_states", e.g. gte-Qwen2).
"""

from light_vllm_tpu.core.workflow import Workflow


class DecodeOnlyWorkflow(Workflow):

    @classmethod
    def from_engine_args(cls, engine_args: dict) -> "Workflow":
        if engine_args.get("output_last_hidden_states"):
            from light_vllm_tpu.decode_only.last_hidden_states_workflow import \
                DecodeOnlyLastHiddenStatesWorkflow

            return DecodeOnlyLastHiddenStatesWorkflow.from_engine_args(
                engine_args)
        from light_vllm_tpu.decoding.workflow import DecodingWorkflow

        return DecodingWorkflow.from_engine_args(engine_args)
