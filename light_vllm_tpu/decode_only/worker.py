"""Worker that runs a causal-LM model in encoder mode (no KV cache) for
embedding workloads (reference: the prefill-only stack under
light_vllm/decode_only/output_last_hidden_states/)."""

from light_vllm_tpu.prefill_only.worker import PrefillOnlyWorker


class DecodeOnlyEncoderWorker(PrefillOnlyWorker):
    """Same as PrefillOnlyWorker; causal-LM models detect encoder mode by
    being called through the dense [B, L] forward (`encode_forward`)."""

    def load_model(self) -> None:
        from light_vllm_tpu.core.loader.loader import get_model_loader
        from light_vllm_tpu.prefill_only.worker import PrefillOnlyModelRunner

        model = self.model_cls(self.engine_config.model_config,
                               attn_backend=self.attn_backend)
        if not hasattr(model, "encode_forward"):
            raise TypeError(
                f"{type(model).__name__} does not support encoder mode")
        loader = get_model_loader(self.engine_config.load_config)
        params = loader.load_params(model, self.engine_config, self.mesh)

        class _EncoderView:
            def __init__(self, inner):
                self.inner = inner

            def __call__(self, p, input_ids, positions, mask,
                         token_type_ids=None):
                return self.inner.encode_forward(p, input_ids, positions,
                                                 mask)

        self.runner = PrefillOnlyModelRunner(_EncoderView(model), self.mesh,
                                             pooling=self.pooling)
        self.runner.prepare(params)
