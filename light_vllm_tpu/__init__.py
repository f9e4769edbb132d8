"""light-vllm-tpu: a TPU-native Workflow-Defined inference Engine.

Package exports mirror the reference's public surface
(reference: light_vllm/__init__.py:1-14).
"""

from light_vllm_tpu.version import __version__


def __getattr__(name):
    # Lazy exports keep `import light_vllm_tpu` free of jax initialization.
    if name == "LLM":
        from light_vllm_tpu.entrypoints.llm import LLM

        return LLM
    if name == "LLMEngine":
        from light_vllm_tpu.core.llm_engine import LLMEngine

        return LLMEngine
    if name == "SamplingParams":
        from light_vllm_tpu.decoding.sampling_params import SamplingParams

        return SamplingParams
    if name == "TextPrompt":
        from light_vllm_tpu.core.schema.engine_io import TextPrompt

        return TextPrompt
    if name == "TokensPrompt":
        from light_vllm_tpu.core.schema.engine_io import TokensPrompt

        return TokensPrompt
    if name == "ModelRegistry":
        from light_vllm_tpu.core.registry import ModelRegistry

        return ModelRegistry
    if name == "Logprob":
        from light_vllm_tpu.core.schema.engine_io import Logprob

        return Logprob
    if name == "EngineArgs":
        from light_vllm_tpu.core.arg_utils import EngineArgs

        return EngineArgs
    if name == "DataParallelLLM":
        from light_vllm_tpu.entrypoints.dp_llm import DataParallelLLM

        return DataParallelLLM
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["LLM", "LLMEngine", "SamplingParams", "TextPrompt", "TokensPrompt",
           "ModelRegistry", "EngineArgs", "DataParallelLLM", "Logprob",
           "__version__"]


def __dir__():
    return sorted(set(globals()) | set(__all__))
