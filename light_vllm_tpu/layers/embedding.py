"""Vocab embedding + LM head (reference: light_vllm/backends/vocab_embedding.py:125,358).

Vocab-sharded over the "tp" axis; XLA handles the sharded gather / the final
all-gather of logits via sharding propagation. Padding the vocab to a
multiple of 128 keeps the lm_head matmul MXU-aligned.
"""

from typing import Optional

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.layers.base import Layer, ParamSpec, Params
from light_vllm_tpu.utils import round_up

DEFAULT_VOCAB_PADDING = 128


class VocabParallelEmbedding(Layer):

    def __init__(self, vocab_size: int, hidden_size: int, *,
                 dtype=jnp.bfloat16, pad_to: int = DEFAULT_VOCAB_PADDING,
                 tp_axis: str = "tp") -> None:
        super().__init__()
        self.vocab_size = vocab_size
        self.padded_vocab_size = round_up(vocab_size, pad_to)
        self.hidden_size = hidden_size
        self._specs = {
            "weight": ParamSpec((self.padded_vocab_size, hidden_size), dtype,
                                P(tp_axis, None)),
        }

    def __call__(self, params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(params["weight"], input_ids, axis=0)


class ParallelLMHead(Layer):
    """Projection to (padded) vocab logits; optionally tied to the input
    embedding (pass the embedding params at call time)."""

    def __init__(self, vocab_size: int, hidden_size: int, *, bias: bool = False,
                 dtype=jnp.bfloat16, pad_to: int = DEFAULT_VOCAB_PADDING,
                 tp_axis: str = "tp") -> None:
        super().__init__()
        self.vocab_size = vocab_size
        self.padded_vocab_size = round_up(vocab_size, pad_to)
        self.hidden_size = hidden_size
        self.has_bias = bias
        self._specs = {
            "weight": ParamSpec((self.padded_vocab_size, hidden_size), dtype,
                                P(tp_axis, None)),
        }
        if bias:
            self._specs["bias"] = ParamSpec((self.padded_vocab_size,), dtype,
                                            P(tp_axis))

    def __call__(self, params: Params, hidden: jnp.ndarray,
                 *, embedding_weight: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        w = embedding_weight if embedding_weight is not None \
            else params["weight"]
        logits = jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)
        if self.has_bias:
            logits = logits + params["bias"].astype(jnp.float32)
        return logits
