"""BERT-family encoders (BERT, XLM-RoBERTa) built on the TPU layer stack.

Counterpart of the reference's encode-only zoo (reference:
light_vllm/encode_only/modelzoo/bert.py:373,
light_vllm/encode_only/modelzoo/xlm_roberta.py:375). The encoder runs as a
dense [B, L] batch with a padding mask — the bucketed-batch design the
prefill-only input builder produces — and bidirectional (ENCODER) attention.

Q/K/V are fused into one kernel at load time so the hot matmul hits the MXU
as a single [H, 3H] contraction.
"""

from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from light_vllm_tpu.layers.activation import get_act_fn
from light_vllm_tpu.layers.base import Layer, ParamSpec, tree_specs
from light_vllm_tpu.layers.embedding import VocabParallelEmbedding
from light_vllm_tpu.layers.linear import (ColumnParallelLinear,
                                          QKVParallelLinear,
                                          ReplicatedLinear,
                                          RowParallelLinear)
from light_vllm_tpu.layers.norm import LayerNorm
from light_vllm_tpu.ops.attention_ref import dense_attention


class BertEncoderLayer:

    def __init__(self, cfg, dtype, attn_backend=None) -> None:
        self.attn_backend = attn_backend
        H = cfg.hidden_size
        heads = cfg.num_attention_heads
        inter = cfg.intermediate_size
        self.num_heads = heads
        self.head_dim = H // heads
        self.qkv = QKVParallelLinear(H, self.head_dim, heads, heads,
                                     bias=True, dtype=dtype)
        self.o = RowParallelLinear(H, H, bias=True, dtype=dtype)
        self.ln_attn = LayerNorm(H, eps=cfg.layer_norm_eps, dtype=dtype)
        self.up = ColumnParallelLinear(H, inter, bias=True, dtype=dtype)
        self.act = get_act_fn(getattr(cfg, "hidden_act", "gelu"))
        self.down = RowParallelLinear(inter, H, bias=True, dtype=dtype)
        self.ln_out = LayerNorm(H, eps=cfg.layer_norm_eps, dtype=dtype)

    def layer_tree(self):
        return {"qkv": self.qkv, "o": self.o, "ln_attn": self.ln_attn,
                "up": self.up, "down": self.down, "ln_out": self.ln_out}

    def __call__(self, p, x, mask):
        B, L, H = x.shape
        qkv = self.qkv(p["qkv"], x)
        q, k, v = self.qkv.split_qkv(qkv)
        q = q.reshape(B, L, self.num_heads, self.head_dim)
        k = k.reshape(B, L, self.num_heads, self.head_dim)
        v = v.reshape(B, L, self.num_heads, self.head_dim)
        if self.attn_backend is not None:
            attn = self.attn_backend(q, k, v, mask)
        else:
            attn = dense_attention(q, k, v, mask.astype(bool), causal=False)
        attn = attn.reshape(B, L, H)
        x = self.ln_attn(p["ln_attn"], x + self.o(p["o"], attn))
        h = self.act(self.up(p["up"], x))
        x = self.ln_out(p["ln_out"], x + self.down(p["down"], h))
        return x


class BertModel:
    """Bidirectional encoder; `variant` switches BERT / RoBERTa position
    handling (RoBERTa offsets positions by padding_idx + 1)."""

    hf_prefixes = ("bert.", "")

    def __init__(self, model_config, attn_backend=None,
                 variant: str = "bert") -> None:
        cfg = model_config.hf_config
        dtype = model_config.dtype
        self.cfg = cfg
        self.dtype = dtype
        self.variant = variant
        self.pad_token_id = getattr(cfg, "pad_token_id", 0) or 0
        H = cfg.hidden_size
        self.word_emb = VocabParallelEmbedding(cfg.vocab_size, H, dtype=dtype)
        self.pos_emb = VocabParallelEmbedding(
            cfg.max_position_embeddings, H, dtype=dtype, pad_to=1)
        n_types = getattr(cfg, "type_vocab_size", 2) or 2
        self.type_emb = VocabParallelEmbedding(n_types, H, dtype=dtype,
                                               pad_to=1)
        self.ln_emb = LayerNorm(H, eps=cfg.layer_norm_eps, dtype=dtype)
        self.encoder_layers = [
            BertEncoderLayer(cfg, dtype, attn_backend)
            for _ in range(cfg.num_hidden_layers)
        ]
        self.pooler = ReplicatedLinear(H, H, bias=True, dtype=dtype)

    # --- param plumbing ---------------------------------------------------
    def layer_tree(self):
        return {
            "word_emb": self.word_emb,
            "pos_emb": self.pos_emb,
            "type_emb": self.type_emb,
            "ln_emb": self.ln_emb,
            "layers": [l.layer_tree() for l in self.encoder_layers],
            "pooler": self.pooler,
        }

    def specs(self):
        return tree_specs(self.layer_tree())

    def init_params(self, key):
        tree = self.layer_tree()
        leaves, treedef = jax.tree.flatten(
            tree, is_leaf=lambda x: isinstance(x, Layer))
        keys = jax.random.split(key, len(leaves))
        params = [l.init_params(k) for l, k in zip(leaves, keys)]
        return jax.tree.unflatten(treedef, params)

    # --- forward ----------------------------------------------------------
    def __call__(self, params, input_ids, positions, mask,
                 token_type_ids=None):
        if self.variant == "roberta":
            # RoBERTa: position_ids = cumsum(mask)*mask + padding_idx
            # (HF create_position_ids_from_input_ids).
            positions = (jnp.cumsum(mask, axis=-1) * mask
                         + self.pad_token_id).astype(jnp.int32)
        x = self.word_emb(params["word_emb"], input_ids)
        x = x + self.pos_emb(params["pos_emb"], positions)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + self.type_emb(params["type_emb"], token_type_ids)
        x = self.ln_emb(params["ln_emb"], x)
        for layer, p in zip(self.encoder_layers, params["layers"]):
            x = layer(p, x, mask)
        pooled = jnp.tanh(self.pooler(params["pooler"], x[:, 0]))
        return {"hidden_states": x, "pooled_output": pooled}

    # --- weight loading ---------------------------------------------------
    def load_weights(self, weights: Iterator[Tuple[str, np.ndarray]]):
        """Map HF bert/roberta checkpoints into the fused param tree
        (reference load_weights contract:
        light_vllm/encode_only/modelzoo/bert.py)."""
        raw: Dict[str, np.ndarray] = {}
        for name, arr in weights:
            for prefix in ("bert.", "roberta.", "model."):
                if name.startswith(prefix):
                    name = name[len(prefix):]
                    break
            raw[name] = np.asarray(arr)

        def lin(prefix):
            w = raw[prefix + ".weight"].T  # HF [out,in] → [in,out]
            b = raw.get(prefix + ".bias")
            return w, b

        p: Dict[str, Any] = {}
        p["word_emb"] = {
            "weight": raw["embeddings.word_embeddings.weight"]}
        p["pos_emb"] = {
            "weight": raw["embeddings.position_embeddings.weight"]}
        if "embeddings.token_type_embeddings.weight" in raw:
            p["type_emb"] = {
                "weight": raw["embeddings.token_type_embeddings.weight"]}
        else:
            p["type_emb"] = {"weight": np.zeros(
                (self.type_emb.padded_vocab_size, self.cfg.hidden_size),
                np.float32)}
        p["ln_emb"] = {"weight": raw["embeddings.LayerNorm.weight"],
                       "bias": raw["embeddings.LayerNorm.bias"]}
        p["layers"] = []
        for i in range(self.cfg.num_hidden_layers):
            pre = f"encoder.layer.{i}."
            qw, qb = lin(pre + "attention.self.query")
            kw, kb = lin(pre + "attention.self.key")
            vw, vb = lin(pre + "attention.self.value")
            ow, ob = lin(pre + "attention.output.dense")
            uw, ub = lin(pre + "intermediate.dense")
            dw, db = lin(pre + "output.dense")
            p["layers"].append({
                "qkv": {"kernel": np.concatenate([qw, kw, vw], axis=1),
                        "bias": np.concatenate([qb, kb, vb])},
                "o": {"kernel": ow, "bias": ob},
                "ln_attn": {
                    "weight": raw[pre + "attention.output.LayerNorm.weight"],
                    "bias": raw[pre + "attention.output.LayerNorm.bias"]},
                "up": {"kernel": uw, "bias": ub},
                "down": {"kernel": dw, "bias": db},
                "ln_out": {"weight": raw[pre + "output.LayerNorm.weight"],
                           "bias": raw[pre + "output.LayerNorm.bias"]},
            })
        if "pooler.dense.weight" in raw:
            pw, pb = lin("pooler.dense")
            p["pooler"] = {"kernel": pw, "bias": pb}
        else:
            H = self.cfg.hidden_size
            p["pooler"] = {"kernel": np.eye(H, dtype=np.float32),
                           "bias": np.zeros((H,), np.float32)}
        return p


class BertForMaskedLM(BertModel):
    """Encode-only entry: returns hidden states (+pooled); the MLM head is
    not needed for embedding workloads (reference:
    light_vllm/encode_only/modelzoo/bert.py:373)."""


class XLMRobertaModel(BertModel):

    def __init__(self, model_config, attn_backend=None):
        super().__init__(model_config, attn_backend, variant="roberta")


class XLMRobertaForMaskedLM(XLMRobertaModel):
    pass
