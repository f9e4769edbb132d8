"""Vocab embedding + LM head (reference: light_vllm/backends/vocab_embedding.py:125,358).

Vocab-sharded over the "tp" axis; XLA handles the sharded gather / the final
all-gather of logits via sharding propagation. Padding the vocab to a
multiple of 128 keeps the lm_head matmul MXU-aligned.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from light_vllm_tpu.layers.base import Layer, ParamSpec, Params
from light_vllm_tpu.parallel.manual import manual_tp_axis, manual_tp_size
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
        w = params["weight"]
        if manual_tp_size() > 1:
            # Manual-TP: w is the local [V/tp, H] vocab shard. Masked
            # local lookup + psum — the classic vocab-parallel embedding
            # (reference: backends/vocab_embedding.py:125 masked gather +
            # all_reduce).
            axis = manual_tp_axis()
            rows = w.shape[0]
            start = jax.lax.axis_index(axis).astype(jnp.int32) * rows
            local = input_ids - start
            valid = (local >= 0) & (local < rows)
            emb = jnp.take(w, jnp.clip(local, 0, rows - 1), axis=0)
            emb = jnp.where(valid[..., None], emb, jnp.zeros_like(emb))
            return jax.lax.psum(emb, axis)
        return jnp.take(w, input_ids, axis=0)


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
            # bias is vocab-sharded alongside w: add the local slice
            # before the gather below.
            logits = logits + params["bias"].astype(jnp.float32)
        if manual_tp_size() > 1:
            # Manual-TP: each shard computed its local vocab columns;
            # gather the full [S, V] row (shards are laid out in vocab
            # order, so tiled all_gather reproduces the global order).
            logits = jax.lax.all_gather(logits, manual_tp_axis(),
                                        axis=1, tiled=True)
        return logits
