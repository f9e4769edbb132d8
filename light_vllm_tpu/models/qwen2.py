"""Qwen2 causal LM — Llama topology with QKV bias
(reference: light_vllm/decode_only/modelzoo/qwen2.py:295)."""

from light_vllm_tpu.models.llama import LlamaForCausalLM


class Qwen2ForCausalLM(LlamaForCausalLM):
    qkv_bias = True
