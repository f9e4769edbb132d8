"""Sampling parameters (reference: light_vllm/decoding/backends/sampling_params.py:94).

Validated per-request sampling controls. Beam search is not supported (the
reference carries it vestigially); n>1 is served by forking sequences.
"""

import copy
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Any, Callable, Dict, List, Optional, Union

from light_vllm_tpu.core.schema.engine_io import Params

_SAMPLING_EPS = 1e-5


class SamplingType(IntEnum):
    GREEDY = 0
    RANDOM = 1
    RANDOM_SEED = 2


LogitsProcessorFn = Callable[[List[int], Any], Any]


@dataclass
class SamplingParams(Params):
    n: int = 1
    best_of: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    seed: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    detokenize: bool = True
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    include_stop_str_in_output: bool = False
    # Per-request logits processors: callables (output_token_ids, logits
    # [V] np.f32) -> logits, applied before penalties (reference:
    # backends/sampling_params.py:39 + sampler._apply_logits_processors).
    # Arbitrary Python can't run inside the jitted step, so rows carrying
    # processors take a documented host-side path: the step returns those
    # rows' raw logits and the host applies processors + penalties +
    # sampling for them (slow path; device result for the row is ignored).
    logits_processors: Optional[List[LogitsProcessorFn]] = None
    # Beam search (reference: the vestigial use_beam_search /
    # get_beam_search_score carried at decoding/schema/sequence.py:350 and
    # BeamSearchParams at backends/sampling_params.py:487; semantics follow
    # HF's BeamSearchScorer so num_beams parity is testable). best_of is
    # the beam width; the top `n` hypotheses by length-penalized score are
    # returned. Requires greedy settings (temperature 0, no top-k/p, no
    # penalties): beams expand from exact log-softmax scores.
    use_beam_search: bool = False
    length_penalty: float = 1.0
    # False = HF heuristic bound; True = stop as soon as best_of
    # hypotheses exist; "never" = only the length bound ends the search.
    early_stopping: Union[bool, str] = False
    # Keep only the LAST k prompt tokens (reference:
    # backends/sampling_params.py:201 truncate_prompt_tokens).
    truncate_prompt_tokens: Optional[int] = None
    # Additive per-token logit bias / whitelist. The reference declares
    # these (backends/sampling_params.py:211-212) but never consumes them;
    # here they lower onto the per-request logits_processors host path.
    logit_bias: Optional[Dict[int, float]] = None
    allowed_token_ids: Optional[List[int]] = None

    def __post_init__(self):
        if self.best_of is None:
            self.best_of = self.n
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        elif self.stop is None:
            self.stop = []
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        if self.logit_bias is not None:
            bias = {int(t): float(b) for t, b in self.logit_bias.items()}

            def _bias(_out_ids, logits, _bias=bias):
                for t, b in _bias.items():
                    logits[t] += b
                return logits

            self.logits_processors = [_bias] + (self.logits_processors
                                                or [])
        if self.allowed_token_ids is not None:
            if not self.allowed_token_ids:
                raise ValueError("allowed_token_ids must be non-empty")
            import numpy as np

            allowed = np.asarray(sorted(set(int(t) for t in
                                            self.allowed_token_ids)))

            def _allow(_out_ids, logits, _allowed=allowed):
                mask = np.full_like(logits, -float("inf"))
                mask[_allowed] = logits[_allowed]
                return mask

            self.logits_processors = [_allow] + (self.logits_processors
                                                 or [])
        self._verify()

    def _verify(self) -> None:
        if self.n < 1:
            raise ValueError(f"n must be >= 1, got {self.n}")
        if self.best_of < self.n:
            raise ValueError("best_of must be >= n")
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError("presence_penalty must be in [-2, 2]")
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError("frequency_penalty must be in [-2, 2]")
        if not 0.0 < self.repetition_penalty <= 2.0:
            raise ValueError("repetition_penalty must be in (0, 2]")
        if self.temperature < 0.0:
            raise ValueError("temperature must be >= 0")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError("top_k must be -1 or >= 1")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError("min_p must be in [0, 1]")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
        if self.min_tokens < 0:
            raise ValueError("min_tokens must be >= 0")
        if self.truncate_prompt_tokens is not None \
                and self.truncate_prompt_tokens < 1:
            raise ValueError("truncate_prompt_tokens must be >= 1")
        if self.use_beam_search:
            if self.best_of < 1:
                raise ValueError("beam width (best_of) must be >= 1")
            if self.temperature > _SAMPLING_EPS or self.top_p < 1.0 \
                    or self.top_k != -1 or self.min_p > 0.0:
                raise ValueError(
                    "beam search requires greedy settings: temperature=0, "
                    "top_p=1, top_k=-1, min_p=0")
            if (self.presence_penalty or self.frequency_penalty
                    or self.repetition_penalty != 1.0 or self.min_tokens
                    or self.logits_processors):
                raise ValueError(
                    "beam search does not compose with penalties, "
                    "min_tokens or logits_processors")
            if self.early_stopping not in (True, False, "never"):
                raise ValueError(
                    "early_stopping must be True, False or 'never'")
            if self.max_tokens is None:
                raise ValueError("beam search requires max_tokens")

    @property
    def sampling_type(self) -> SamplingType:
        if self.temperature < _SAMPLING_EPS:
            return SamplingType.GREEDY
        if self.seed is not None:
            return SamplingType.RANDOM_SEED
        return SamplingType.RANDOM

    def clone(self) -> "SamplingParams":
        return copy.deepcopy(self)
