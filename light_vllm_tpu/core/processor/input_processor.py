"""Input / request processors.

InputProcessor normalizes raw user prompts into Request objects cheaply at
add_request time; RequestProcessor does the expensive tokenization lazily at
first scheduling (reference: light_vllm/core/processor/input_processor.py:14-127).
"""

from abc import ABC, abstractmethod
from typing import Any, Dict, Optional, Union

from light_vllm_tpu.core.schema.engine_io import (Params, PromptType, Request,
                                                  SchedulableRequest,
                                                  TextOnlyInputs, TextPrompt,
                                                  TextRequest, TokensPrompt,
                                                  ValidationError)


def _validate_token_ids(token_ids) -> list:
    """Coerce to List[int] at add_request time: a malformed id list must
    fail HERE, not inside a scheduled step (which would strand the request
    in the scheduler and hang subsequent generate() calls)."""
    if isinstance(token_ids, (str, bytes)):
        raise ValidationError(
            f"prompt_token_ids must be a sequence of ints, "
            f"got {type(token_ids).__name__}")
    try:
        return [int(t) for t in token_ids]
    except (TypeError, ValueError) as e:
        raise ValidationError(f"invalid prompt_token_ids: {e}") from e


def normalize_prompt(prompt: PromptType) -> TextOnlyInputs:
    if isinstance(prompt, str):
        return TextOnlyInputs(prompt=prompt)
    if isinstance(prompt, TextPrompt):
        return TextOnlyInputs(prompt=prompt.prompt)
    if isinstance(prompt, TokensPrompt):
        return TextOnlyInputs(
            prompt_token_ids=_validate_token_ids(prompt.prompt_token_ids))
    if isinstance(prompt, TextOnlyInputs):
        return prompt
    if isinstance(prompt, dict):
        if "prompt_token_ids" in prompt:
            return TextOnlyInputs(
                prompt_token_ids=_validate_token_ids(
                    prompt["prompt_token_ids"]),
                prompt=prompt.get("prompt"))
        if "prompt" in prompt:
            return TextOnlyInputs(prompt=prompt["prompt"])
    raise ValidationError(f"unsupported prompt type: {type(prompt)!r}")


class InputProcessor(ABC):
    """Inputs + params → Request (cheap; runs at add_request)."""

    @classmethod
    def from_engine(cls, engine) -> "InputProcessor":
        return cls()

    @abstractmethod
    def __call__(self, request_id: str, prompt: PromptType,
                 params: Optional[Params], arrival_time: float) -> Request:
        ...


class TextInputProcessor(InputProcessor):

    def __call__(self, request_id: str, prompt: PromptType,
                 params: Optional[Params], arrival_time: float) -> TextRequest:
        inputs = normalize_prompt(prompt)
        return TextRequest(request_id=str(request_id), inputs=inputs,
                           params=params, arrival_time=arrival_time)


class RequestProcessor(ABC):
    """Request → SchedulableRequest (tokenization; runs lazily at first
    scheduling so the waiting queue stays cheap)."""

    @classmethod
    def from_engine(cls, engine) -> "RequestProcessor":
        raise NotImplementedError

    @abstractmethod
    def __call__(self, request: Request) -> SchedulableRequest:
        ...
