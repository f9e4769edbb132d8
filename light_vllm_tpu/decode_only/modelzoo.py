"""Decode-only model registry (reference: light_vllm/decode_only/modelzoo/__init__.py:5-10)."""

DECODE_ONLY_MODELS = {
    "Qwen2ForCausalLM": (
        "light_vllm_tpu.models.qwen2:Qwen2ForCausalLM",
        "light_vllm_tpu.decode_only.workflow:DecodeOnlyWorkflow"),
    "LlamaForCausalLM": (
        "light_vllm_tpu.models.llama:LlamaForCausalLM",
        "light_vllm_tpu.decode_only.workflow:DecodeOnlyWorkflow"),
    "MistralForCausalLM": (
        "light_vllm_tpu.models.llama:LlamaForCausalLM",
        "light_vllm_tpu.decode_only.workflow:DecodeOnlyWorkflow"),
    "MixtralForCausalLM": (
        "light_vllm_tpu.models.mixtral:MixtralForCausalLM",
        "light_vllm_tpu.decode_only.workflow:DecodeOnlyWorkflow"),
    "GemmaForCausalLM": (
        "light_vllm_tpu.models.gemma:GemmaForCausalLM",
        "light_vllm_tpu.decode_only.workflow:DecodeOnlyWorkflow"),
    "Gemma2ForCausalLM": (
        "light_vllm_tpu.models.gemma:Gemma2ForCausalLM",
        "light_vllm_tpu.decode_only.workflow:DecodeOnlyWorkflow"),
}
