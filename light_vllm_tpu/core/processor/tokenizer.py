"""Tokenizer wrapper + incremental detokenization.

Counterpart of the reference's tokenizer module (reference:
light_vllm/core/processor/tokenizer.py:16-475). Incremental detokenization is
host-side and latency-critical during decode: we re-decode only a small
trailing window of tokens per step and emit text deltas once the decoded
suffix stabilizes (no dangling UTF-8 replacement char).
"""

from typing import Any, Dict, List, Optional, Tuple

from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

# Number of trailing tokens to re-decode each step; enough context for
# sentencepiece/BPE merge effects to stabilize.
INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET = 5


class Tokenizer:
    """Wraps an HF (or HF-compatible) tokenizer with cached hot attributes."""

    def __init__(self, tokenizer_name: str = "", *, tokenizer: Any = None,
                 trust_remote_code: bool = False,
                 revision: Optional[str] = None, **kwargs) -> None:
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                tokenizer_name, trust_remote_code=trust_remote_code,
                revision=revision, **kwargs)
        self.tokenizer = tokenizer
        # Cache hot attributes: HF property lookups are surprisingly slow
        # and these sit on the per-token critical path.
        self.eos_token_id: Optional[int] = getattr(tokenizer, "eos_token_id",
                                                   None)
        self.bos_token_id: Optional[int] = getattr(tokenizer, "bos_token_id",
                                                   None)
        self.pad_token_id: Optional[int] = getattr(tokenizer, "pad_token_id",
                                                   None)
        all_special_ids = getattr(tokenizer, "all_special_ids", None) or []
        self.all_special_ids = set(all_special_ids)
        try:
            self.vocab_size: int = len(tokenizer)
        except TypeError:
            self.vocab_size = getattr(tokenizer, "vocab_size", 0)
        self._is_fast = getattr(tokenizer, "is_fast", False)
        # Added/special token STRINGS: convert_tokens_to_string must keep
        # these verbatim and join around them (reference:
        # core/processor/tokenizer.py _convert_tokens_to_string_with_added_encoders).
        try:
            added = set(tokenizer.get_added_vocab() or {})
        except Exception:
            added = set()
        added.update(getattr(tokenizer, "all_special_tokens", None) or [])
        self._added_tokens = added

    @classmethod
    def from_engine(cls, engine) -> "Tokenizer":
        mc = engine.engine_config.model_config
        if getattr(engine, "tokenizer_override", None) is not None:
            return cls(tokenizer=engine.tokenizer_override)
        if not mc.tokenizer:
            # Token-ids-only usage (tests, benchmarks with dummy weights).
            return cls(tokenizer=NullHFTokenizer())
        return cls(mc.tokenizer, trust_remote_code=mc.trust_remote_code,
                   revision=mc.revision)

    # --- encoding ----------------------------------------------------------
    def encode(self, text: str, **kwargs) -> List[int]:
        return self.tokenizer.encode(text, **kwargs)

    def encode_pair(self, query: str, passage: str,
                    max_length: Optional[int] = None) -> List[int]:
        """Cross-encoder pair tokenization for rerankers."""
        out = self.tokenizer(query, passage, truncation=True,
                             max_length=max_length)
        return out["input_ids"]

    def decode(self, token_ids: List[int], **kwargs) -> str:
        return self.tokenizer.decode(token_ids, **kwargs)

    def apply_chat_template(self, *args, **kwargs):
        return self.tokenizer.apply_chat_template(*args, **kwargs)

    # --- incremental detokenization ---------------------------------------
    def convert_ids_to_tokens(self, ids: List[int],
                              skip_special_tokens: bool = False) -> List[str]:
        toks = self.tokenizer.convert_ids_to_tokens(
            ids, skip_special_tokens=skip_special_tokens)
        return toks

    def convert_tokens_to_string(
            self, tokens: List[str],
            spaces_between_special_tokens: bool = True) -> str:
        """tokens → text. Added/special tokens (present when
        skip_special_tokens=False) are kept verbatim; the pieces around
        them are joined with " " or "" per spaces_between_special_tokens
        (reference: core/processor/tokenizer.py:152-155 +
        _convert_tokens_to_string_with_added_encoders)."""
        added = self._added_tokens
        if not added or not any(t in added for t in tokens):
            return self.tokenizer.convert_tokens_to_string(tokens)
        sub_texts: List[str] = []
        current: List[str] = []
        for t in tokens:
            if t in added:
                if current:
                    sub_texts.append(
                        self.tokenizer.convert_tokens_to_string(current))
                    current = []
                sub_texts.append(t)
            else:
                current.append(t)
        if current:
            sub_texts.append(self.tokenizer.convert_tokens_to_string(current))
        sep = " " if spaces_between_special_tokens else ""
        return sep.join(sub_texts)

    def detokenize_incrementally(
        self,
        all_token_ids: List[int],
        prev_tokens: Optional[List[str]],
        prefix_offset: int,
        read_offset: int,
        skip_special_tokens: bool = True,
        spaces_between_special_tokens: bool = True,
    ) -> Tuple[List[str], str, int, int]:
        """Decode the newest token(s) given cached window state.

        Returns (new_tokens, new_decoded_text, new_prefix_offset,
        new_read_offset). The caller threads the offsets/tokens through
        successive calls (see IncrementalDetokenizer).
        """
        if prev_tokens is None:
            # First call: prime the window over the whole sequence.
            new_tokens = self.convert_ids_to_tokens(
                all_token_ids, skip_special_tokens=skip_special_tokens)
            output_tokens = new_tokens
            prefix_offset = max(
                len(output_tokens) - INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET,
                0)
            read_offset = max(len(output_tokens), 0)
        else:
            new_ids = all_token_ids[len(prev_tokens):]
            new_tokens = self.convert_ids_to_tokens(
                new_ids, skip_special_tokens=skip_special_tokens)
            # skip_special_tokens with convert_ids_to_tokens drops entries;
            # pad with empty strings so offsets stay aligned with ids.
            if len(new_tokens) < len(new_ids):
                kept = iter(new_tokens)
                new_tokens = []
                for tid in new_ids:
                    if skip_special_tokens and tid in self.all_special_ids:
                        new_tokens.append("")
                    else:
                        new_tokens.append(next(kept, ""))
            output_tokens = prev_tokens + new_tokens

        prefix_text = self.convert_tokens_to_string(
            [t for t in output_tokens[prefix_offset:read_offset] if t],
            spaces_between_special_tokens=spaces_between_special_tokens)
        full_text = self.convert_tokens_to_string(
            [t for t in output_tokens[prefix_offset:] if t],
            spaces_between_special_tokens=spaces_between_special_tokens)

        if len(full_text) <= len(prefix_text) or full_text.endswith("�"):
            # Not enough bytes for a full character yet; emit nothing.
            return new_tokens, "", prefix_offset, read_offset
        new_text = full_text[len(prefix_text):]
        return (new_tokens, new_text, read_offset, len(output_tokens))


class IncrementalDetokenizer:
    """Per-sequence detokenization state machine."""

    def __init__(self, tokenizer: Tokenizer,
                 skip_special_tokens: bool = True) -> None:
        self.tokenizer = tokenizer
        self.skip_special_tokens = skip_special_tokens
        self.tokens: Optional[List[str]] = None
        self.prefix_offset = 0
        self.read_offset = 0
        self.text = ""

    def update(self, all_token_ids: List[int]) -> str:
        """Feed the full token id list; returns newly decoded text delta."""
        (new_tokens, delta, self.prefix_offset,
         self.read_offset) = self.tokenizer.detokenize_incrementally(
             all_token_ids, self.tokens, self.prefix_offset, self.read_offset,
             skip_special_tokens=self.skip_special_tokens)
        if self.tokens is None:
            self.tokens = new_tokens
        else:
            self.tokens.extend(new_tokens)
        self.text += delta
        return delta


class NullHFTokenizer:
    """Placeholder for token-ids-only pipelines: decoding degrades to id
    strings; encoding raises."""

    eos_token_id = None
    bos_token_id = None
    pad_token_id = None
    all_special_ids: list = []
    is_fast = False

    def __len__(self) -> int:
        return 0

    def encode(self, text, **kwargs):
        raise RuntimeError("no tokenizer configured; pass prompt_token_ids")

    def decode(self, ids, **kwargs) -> str:
        return " ".join(str(i) for i in ids)

    def convert_ids_to_tokens(self, ids, skip_special_tokens=False):
        return [str(i) for i in ids]

    def convert_tokens_to_string(self, tokens) -> str:
        return " ".join(tokens)


def get_cached_tokenizer(tokenizer: Any) -> Tokenizer:
    """Wrap an already-constructed HF tokenizer."""
    if isinstance(tokenizer, Tokenizer):
        return tokenizer
    return Tokenizer(tokenizer=tokenizer)
