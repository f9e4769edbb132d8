"""Engine-side IO schemas.

Counterpart of the reference's request/prompt dataclasses
(reference: light_vllm/core/schema/engine_io.py:5-83). These are pure-host
objects; nothing here touches JAX.
"""

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union


class ValidationError(ValueError):
    """Raised when user inputs fail validation."""


class Logprob(float):
    """Log probability of one token candidate.

    Behaves as a plain float (this repo's historical logprob schema, and
    what arithmetic consumers expect) while carrying the reference's
    Logprob fields (reference: light_vllm/decoding/schema/sequence.py
    Logprob: logprob / rank / decoded_token, filled by
    core/processor/tokenizer.py:45-205 decode_*_inplace).

    rank: 1-based rank among the step's returned top-k candidates
    (None when the token fell outside the top-k window — the device step
    does not compute full-vocab ranks).
    decoded_token: the text this candidate would append to the sequence
    (None unless SamplingParams.detokenize and a tokenizer is present).
    """

    __slots__ = ("rank", "decoded_token")

    def __new__(cls, logprob: float, rank: Optional[int] = None,
                decoded_token: Optional[str] = None) -> "Logprob":
        self = super().__new__(cls, logprob)
        self.rank = rank
        self.decoded_token = decoded_token
        return self

    @property
    def logprob(self) -> float:
        return float(self)

    def __repr__(self) -> str:
        return (f"Logprob({float(self)!r}, rank={self.rank}, "
                f"decoded_token={self.decoded_token!r})")


@dataclass
class Params:
    """Base class for per-request parameter bundles (sampling, pooling...)."""


@dataclass
class Inputs:
    """Base class for raw user inputs before processing."""


@dataclass
class TextPrompt(Inputs):
    prompt: str
    multi_modal_data: Optional[Dict[str, Any]] = None


@dataclass
class TokensPrompt(Inputs):
    prompt_token_ids: List[int]
    multi_modal_data: Optional[Dict[str, Any]] = None


@dataclass
class TextOnlyInputs(Inputs):
    """Normalized inputs: token ids, optionally with the original text."""

    prompt_token_ids: List[int] = field(default_factory=list)
    prompt: Optional[str] = None


PromptType = Union[str, TextPrompt, TokensPrompt, TextOnlyInputs, Dict[str, Any]]


@dataclass
class RequestMetrics:
    """Per-request latency bookkeeping
    (reference: light_vllm/decoding/schema/sequence.py:77-93)."""

    arrival_time: float = 0.0
    first_scheduled_time: Optional[float] = None
    first_token_time: Optional[float] = None
    time_in_queue: Optional[float] = None
    finished_time: Optional[float] = None

    def on_first_schedule(self, now: Optional[float] = None) -> None:
        if self.first_scheduled_time is None:
            now = time.time() if now is None else now
            self.first_scheduled_time = now
            self.time_in_queue = now - self.arrival_time

    def on_token(self, now: Optional[float] = None) -> None:
        if self.first_token_time is None:
            self.first_token_time = time.time() if now is None else now


@dataclass
class Request:
    """A user request after input processing, before tokenization."""

    request_id: str
    arrival_time: float = field(default_factory=time.time)
    metrics: RequestMetrics = field(default_factory=RequestMetrics)

    def __post_init__(self):
        if self.metrics.arrival_time == 0.0:
            self.metrics.arrival_time = self.arrival_time


@dataclass
class TextRequest(Request):
    inputs: Optional[TextOnlyInputs] = None
    params: Optional[Params] = None


@dataclass
class SchedulableRequest(Request):
    """A request after request-processing (tokenized, ready to schedule)."""

    def num_new_tokens(self) -> int:
        raise NotImplementedError


@dataclass
class SchedulerOutput:
    """Base class for what a scheduler hands to the model-input builder."""

    def is_empty(self) -> bool:
        raise NotImplementedError

    def needs_execution(self) -> bool:
        """False when the step has only ignored/finished bookkeeping to
        emit and no model forward to run; the engine then calls the
        output processor with execute_output=None."""
        return True


@dataclass
class CompletionOutput:
    """One generated completion of a request."""

    index: int
    text: str
    token_ids: List[int]
    cumulative_logprob: Optional[float] = None
    logprobs: Optional[List[Dict[int, Logprob]]] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[Union[int, str]] = None

    @property
    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class RequestOutput:
    """What the engine returns to the user for one request."""

    request_id: str
    finished: bool
    prompt: Optional[str] = None
    prompt_token_ids: Optional[List[int]] = None
    outputs: List[CompletionOutput] = field(default_factory=list)
    # [None] + one {token_id: Logprob} dict per prompt position (when
    # SamplingParams.prompt_logprobs is set)
    prompt_logprobs: Optional[List[Optional[Dict[int, Logprob]]]] = None
    metrics: Optional[RequestMetrics] = None


@dataclass
class EmbeddingRequestOutput:
    """Output of encode/retriever workflows: a dense vector (or raw states)."""

    request_id: str
    finished: bool
    embedding: Any = None  # np.ndarray
    prompt_token_ids: Optional[List[int]] = None


@dataclass
class RerankerRequestOutput:
    """Output of the reranker workflow: a scalar relevance score."""

    request_id: str
    finished: bool
    score: float = 0.0
