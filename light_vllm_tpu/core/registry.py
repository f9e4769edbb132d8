"""Model registry: architecture name → (task, model class path, workflow path).

Counterpart of the reference's ModelRegistry (reference:
light_vllm/core/modelzoo.py:28-64). Each task package contributes a dict of
`arch: (module:Class, workflow module:Class)` entries; out-of-tree models can
be registered at runtime.
"""

from typing import Dict, List, Optional, Tuple

from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

# arch -> (task_name, model "module:Class", workflow "module:Class")
_REGISTRY: Dict[str, Tuple[str, str, str]] = {}
_BUILTIN_LOADED = False


def _load_builtin() -> None:
    global _BUILTIN_LOADED
    if _BUILTIN_LOADED:
        return
    _BUILTIN_LOADED = True
    from light_vllm_tpu.decode_only.modelzoo import DECODE_ONLY_MODELS
    from light_vllm_tpu.encode_only.modelzoo import ENCODE_ONLY_MODELS
    from light_vllm_tpu.reranker.modelzoo import RERANKER_MODELS
    from light_vllm_tpu.retriever.modelzoo import RETRIEVER_MODELS

    for task, zoo in (("decode_only", DECODE_ONLY_MODELS),
                      ("encode_only", ENCODE_ONLY_MODELS),
                      ("retriever", RETRIEVER_MODELS),
                      ("reranker", RERANKER_MODELS)):
        for arch, (model_path, workflow_path) in zoo.items():
            _REGISTRY.setdefault(arch, (task, model_path, workflow_path))


class ModelRegistry:

    @staticmethod
    def register_model(arch: str, task: str, model_path: str,
                       workflow_path: str) -> None:
        _load_builtin()
        if arch in _REGISTRY:
            logger.warning("overriding registered architecture %s", arch)
        _REGISTRY[arch] = (task, model_path, workflow_path)

    @staticmethod
    def resolve(architectures: List[str],
                served_model_name: Optional[str] = None
                ) -> Tuple[str, str, str]:
        """Return (task, model_path, workflow_path) for the first known arch.

        `served_model_name` lets name-dependent dispatch (e.g. gte-Qwen2
        running Qwen2 as an embedder) pick a different workflow; that hook
        lives in the workflow's `from_engine_args`.
        """
        _load_builtin()
        for arch in architectures:
            if arch in _REGISTRY:
                return _REGISTRY[arch]
        raise ValueError(
            f"no registered model for architectures {architectures}; "
            f"known: {sorted(_REGISTRY)}")

    @staticmethod
    def get_supported_archs() -> List[str]:
        _load_builtin()
        return sorted(_REGISTRY)

    @staticmethod
    def get_workflow(architectures: List[str]) -> str:
        return ModelRegistry.resolve(architectures)[2]

    @staticmethod
    def get_model_path(architectures: List[str]) -> str:
        return ModelRegistry.resolve(architectures)[1]
