"""Reranker pair inputs (reference: light_vllm/reranker/schema/engine_io.py:7-14)."""

from dataclasses import dataclass

from light_vllm_tpu.core.schema.engine_io import Inputs


@dataclass
class Pairs(Inputs):
    query: str
    passage: str
