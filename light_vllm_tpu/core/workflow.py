"""Workflow-Defined Engine (WDE) component map.

The single most load-bearing design carried over from the reference
(reference: light_vllm/core/workflow.py:4-22): every engine component is named
by a "module:Class" string on a Workflow class; the generic LLMEngine
lazy-imports and wires them. Task families (decoding, encode-only, retriever,
reranker) subclass Workflow and swap components.
"""

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from light_vllm_tpu.core.llm_engine import LLMEngine


class Workflow:
    EngineArgs: str = ""
    Scheduler: str = ""
    AttnBackend: str = ""
    Tokenizer: str = (
        "light_vllm_tpu.core.processor.tokenizer:Tokenizer")
    InputProcessor: str = ""
    RequestProcessor: str = ""
    ModelInputBuilder: str = ""
    OutputProcessor: str = ""
    Executor: str = ""
    Worker: str = ""
    attn_type: str = "DECODER"

    @classmethod
    def from_engine(cls, engine: "LLMEngine") -> "Workflow":
        """Hook: a workflow may specialize itself from the resolved engine
        config (e.g. pick the async executor). Returns a (sub)class."""
        return cls

    @classmethod
    def from_engine_args(cls, engine_args: dict) -> "Workflow":
        """Hook: a workflow may dispatch to a sibling based on raw args."""
        return cls


def lazy_import(qualname: str):
    """Import "module.path:ClassName" → class object
    (reference: light_vllm/core/llm_engine.py:13-17)."""
    import importlib

    module_name, _, class_name = qualname.partition(":")
    if not class_name:
        raise ValueError(f"workflow component {qualname!r} must be "
                         "'module.path:ClassName'")
    module = importlib.import_module(module_name)
    return getattr(module, class_name)
