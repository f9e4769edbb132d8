"""Gemma / Gemma 2 causal LMs on the TPU layer stack.

Family highlights vs Llama (reference analog: the reference ships the Gemma
RoPE/RMSNorm variants in its layer zoo, light_vllm/backends/layernorm.py:76,
rotary_embedding.py Gemma path, without a model; we wire the full model):

  Gemma:  (1 + w) RMSNorm, gated-GELU MLP, embeddings scaled by sqrt(H),
          always-tied LM head, explicit head_dim.
  Gemma2: additionally 4 norms per layer (pre/post attention and MLP),
          attention logit soft-capping, final logit soft-capping,
          alternating local (sliding-window) / global attention layers, and
          query scaling by query_pre_attn_scalar**-0.5 — the soft-cap and
          window paths run in the Pallas kernels
          (ops/paged_attention_pallas.py, ops/prefill_attention_pallas.py).
"""

from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from light_vllm_tpu.decoding.attention import (Attention,
                                               DecodeAttnMetadata, KVScales)
from light_vllm_tpu.layers.activation import gelu_tanh_and_mul
from light_vllm_tpu.layers.base import Layer, tree_specs
from light_vllm_tpu.layers.embedding import VocabParallelEmbedding
from light_vllm_tpu.layers.linear import (MergedColumnParallelLinear,
                                          QKVParallelLinear,
                                          RowParallelLinear, gated_mlp_act)
from light_vllm_tpu.layers.norm import GemmaRMSNorm
from light_vllm_tpu.layers.rotary import get_rope
from light_vllm_tpu.ops.attention_ref import dense_attention


class GemmaDecoderLayer:
    """Shared Gemma-family layer; `gemma2` toggles the extra norms,
    soft cap and per-layer sliding window."""

    def __init__(self, cfg, dtype, attn_backend, layer_idx: int, *,
                 gemma2: bool, max_position: int,
                 quant_config=None) -> None:
        H = cfg.hidden_size
        self.gemma2 = gemma2
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = getattr(cfg, "num_key_value_heads",
                                    None) or self.num_heads
        self.head_dim = getattr(cfg, "head_dim", None) or \
            H // self.num_heads
        inter = cfg.intermediate_size
        eps = getattr(cfg, "rms_norm_eps", 1e-6)

        def qm():
            return quant_config.get_linear_method() if quant_config else None

        self.qkv = QKVParallelLinear(H, self.head_dim, self.num_heads,
                                     self.num_kv_heads, bias=False,
                                     dtype=dtype, quant_method=qm())
        self.o = RowParallelLinear(self.num_heads * self.head_dim, H,
                                   bias=False, dtype=dtype,
                                   quant_method=qm())
        self.gate_up = MergedColumnParallelLinear(H, [inter, inter],
                                                  bias=False, dtype=dtype,
                                                  quant_method=qm())
        self.down = RowParallelLinear(inter, H, bias=False, dtype=dtype,
                                      quant_method=qm())
        self.act = gelu_tanh_and_mul
        self.input_ln = GemmaRMSNorm(H, eps=eps, dtype=dtype)
        self.post_attn_ln = GemmaRMSNorm(H, eps=eps, dtype=dtype)
        if gemma2:
            self.pre_ffw_ln = GemmaRMSNorm(H, eps=eps, dtype=dtype)
            self.post_ffw_ln = GemmaRMSNorm(H, eps=eps, dtype=dtype)

        rope_theta = getattr(cfg, "rope_theta", None) or 10000.0
        self.rope = get_rope(self.head_dim, self.head_dim, max_position,
                             rope_theta, is_neox_style=True, dtype=dtype)

        if gemma2:
            scale = float(getattr(cfg, "query_pre_attn_scalar",
                                  self.head_dim)) ** -0.5
            soft_cap = getattr(cfg, "attn_logit_softcapping", None)
            # HF Gemma2: even layer indices use the sliding window.
            window = getattr(cfg, "sliding_window", None) \
                if layer_idx % 2 == 0 else None
        else:
            scale = self.head_dim ** -0.5
            soft_cap = None
            window = None
        self.scale = scale
        self.soft_cap = soft_cap
        self.window = window
        self.attn = Attention(
            self.num_heads, self.head_dim, self.num_kv_heads, scale=scale,
            backend=attn_backend, sliding_window=window,
            logits_soft_cap=soft_cap) if attn_backend is not None else None
        self.kv_scales = KVScales() \
            if getattr(attn_backend, "needs_kv_scales", False) else None

    def layer_tree(self):
        tree = {"qkv": self.qkv, "o": self.o, "gate_up": self.gate_up,
                "down": self.down, "input_ln": self.input_ln,
                "post_attn_ln": self.post_attn_ln}
        if self.gemma2:
            tree["pre_ffw_ln"] = self.pre_ffw_ln
            tree["post_ffw_ln"] = self.post_ffw_ln
        if self.kv_scales is not None:
            tree["attn_scales"] = self.kv_scales
        return tree

    def __call__(self, p, x, positions, kv_cache, meta: DecodeAttnMetadata,
                 layer_idx=None):
        residual = x
        x = self.input_ln(p["input_ln"], x)
        qkv = self.qkv(p["qkv"], x)
        q, k, v = self.qkv.split_qkv(qkv)
        q, k = self.rope(positions, q, k)
        attn_out, kv_cache = self.attn(q, k, v, kv_cache, meta, layer_idx,
                                       scales=p.get("attn_scales"))
        attn_out = self.o(p["o"], attn_out)
        if self.gemma2:
            attn_out = self.post_attn_ln(p["post_attn_ln"], attn_out)
            x = residual + attn_out
            residual = x
            x = self.pre_ffw_ln(p["pre_ffw_ln"], x)
            x = self.down(p["down"], gated_mlp_act(
                self.act, self.gate_up, p["gate_up"], x))
            x = self.post_ffw_ln(p["post_ffw_ln"], x)
            return residual + x, kv_cache
        x = residual + attn_out
        residual = x
        x = self.post_attn_ln(p["post_attn_ln"], x)
        x = residual + self.down(p["down"], gated_mlp_act(
            self.act, self.gate_up, p["gate_up"], x))
        return x, kv_cache

    def encode_call(self, p, x, positions, mask, causal: bool):
        B, L, H = x.shape
        residual = x
        x = self.input_ln(p["input_ln"], x)
        qkv = self.qkv(p["qkv"], x.reshape(B * L, H))
        q, k, v = self.qkv.split_qkv(qkv)
        q, k = self.rope(positions.reshape(-1), q, k)
        q = q.reshape(B, L, self.num_heads, self.head_dim)
        k = k.reshape(B, L, self.num_kv_heads, self.head_dim)
        v = v.reshape(B, L, self.num_kv_heads, self.head_dim)
        attn = dense_attention(q, k, v, mask.astype(bool), causal=causal,
                               scale=self.scale,
                               sliding_window=self.window,
                               logits_soft_cap=self.soft_cap)
        attn = attn.reshape(B, L, self.num_heads * self.head_dim)
        attn = self.o(p["o"], attn)
        if self.gemma2:
            attn = self.post_attn_ln(p["post_attn_ln"], attn)
            x = residual + attn
            residual = x
            x = self.pre_ffw_ln(p["pre_ffw_ln"], x)
            x = self.down(p["down"], self.act(self.gate_up(p["gate_up"], x)))
            return residual + self.post_ffw_ln(p["post_ffw_ln"], x)
        x = residual + attn
        residual = x
        x = self.post_attn_ln(p["post_attn_ln"], x)
        return residual + self.down(
            p["down"], self.act(self.gate_up(p["gate_up"], x)))


class GemmaForCausalLM:
    """HF arch names: GemmaForCausalLM (gemma2=False),
    Gemma2ForCausalLM (gemma2=True via subclass)."""

    gemma2 = False
    encode_causal = True

    def __init__(self, model_config, attn_backend=None) -> None:
        cfg = model_config.hf_config
        dtype = model_config.dtype
        self.cfg = cfg
        self.dtype = dtype
        self.model_config = model_config
        H = cfg.hidden_size
        from light_vllm_tpu.layers.quant import quant_config_from_model_config

        quant_config = quant_config_from_model_config(model_config)
        self.embed = VocabParallelEmbedding(cfg.vocab_size, H, dtype=dtype)
        self.decoder_layers = [
            GemmaDecoderLayer(cfg, dtype, attn_backend, i,
                              gemma2=self.gemma2,
                              max_position=model_config.max_model_len,
                              quant_config=quant_config)
            for i in range(cfg.num_hidden_layers)
        ]
        self.final_norm = GemmaRMSNorm(H, eps=getattr(cfg, "rms_norm_eps",
                                                      1e-6), dtype=dtype)
        self.num_layers = cfg.num_hidden_layers
        # Gemma2 alternates window/global layers → scan over pairs
        # (period 2); Gemma1 layers are homogeneous (period 1).
        self.scan_period = 2 if self.gemma2 else 1
        from light_vllm_tpu import envs

        self.scan_layers = bool(
            envs.LVT_SCAN_LAYERS
            and self.num_layers > self.scan_period
            and self.num_layers % self.scan_period == 0)
        # Gemma scales embeddings by sqrt(H), computed in the weight dtype
        # (HF casts the normalizer to the embedding dtype). Host numpy, not
        # a device array: device-array attributes become jax.Array
        # constants the lowering then fetches back d2h (see rotary.py).
        self.embed_normalizer = np.asarray(H ** 0.5).astype(
            np.dtype(jnp.dtype(dtype)))
        self.final_logit_softcap = getattr(cfg, "final_logit_softcapping",
                                           None) if self.gemma2 else None

    def layer_tree(self):
        return {
            "embed": self.embed,
            "layers": [l.layer_tree() for l in self.decoder_layers],
            "final_norm": self.final_norm,
        }

    def specs(self):
        tree = tree_specs(self.layer_tree())
        if self.scan_layers:
            from light_vllm_tpu.layers.base import stack_layer_specs

            tree["layers"] = stack_layer_specs(tree["layers"])
        return tree

    def init_params(self, key):
        tree = self.layer_tree()
        leaves, treedef = jax.tree.flatten(
            tree, is_leaf=lambda x: isinstance(x, Layer))
        keys = jax.random.split(key, len(leaves))
        params = [l.init_params(k) for l, k in zip(leaves, keys)]
        params = jax.tree.unflatten(treedef, params)
        if self.scan_layers:
            from light_vllm_tpu.layers.base import stack_layer_params

            params["layers"] = stack_layer_params(params["layers"])
        return params

    def __call__(self, params, input_ids, positions, kv_caches,
                 meta: DecodeAttnMetadata):
        x = self.embed(params["embed"], input_ids) * self.embed_normalizer
        if self.scan_layers:
            from light_vllm_tpu.models.scan_utils import scan_decoder_layers

            x, kv_caches = scan_decoder_layers(
                self.decoder_layers, params["layers"], x, kv_caches,
                lambda layer, p, x, kv, l: layer(p, x, positions, kv,
                                                 meta, l),
                period=self.scan_period)
            x = self.final_norm(params["final_norm"], x)
            return x, kv_caches
        new_caches = []
        for layer, p, cache in zip(self.decoder_layers, params["layers"],
                                   kv_caches):
            x, cache = layer(p, x, positions, cache, meta)
            new_caches.append(cache)
        x = self.final_norm(params["final_norm"], x)
        return x, new_caches

    def compute_logits(self, params, hidden, logits_indices):
        rows = hidden[logits_indices]
        logits = jnp.dot(rows.astype(jnp.float32),
                         params["embed"]["weight"].astype(jnp.float32).T)
        if self.final_logit_softcap is not None:
            cap = self.final_logit_softcap
            logits = cap * jnp.tanh(logits / cap)
        return logits[:, :self.cfg.vocab_size]

    def encode_forward(self, params, input_ids, positions, mask):
        x = self.embed(params["embed"], input_ids) * self.embed_normalizer
        if self.scan_layers:
            from light_vllm_tpu.models.scan_utils import scan_encode_layers

            x = scan_encode_layers(
                self.decoder_layers, params["layers"], x,
                lambda layer, p, x: layer.encode_call(
                    p, x, positions, mask, causal=self.encode_causal),
                period=self.scan_period)
        else:
            for layer, p in zip(self.decoder_layers, params["layers"]):
                x = layer.encode_call(p, x, positions, mask,
                                      causal=self.encode_causal)
        x = self.final_norm(params["final_norm"], x)
        return {"hidden_states": x, "pooled_output": None}

    def load_weights(self, weights: Iterator[Tuple[str, np.ndarray]]):
        from light_vllm_tpu.layers.quant.ingest import concat_cols, get_kernel

        L = self.num_layers
        p: Dict[str, Any] = {"layers": [dict() for _ in range(L)]}
        staging: Dict[str, Dict[str, np.ndarray]] = {}
        for name, arr in weights:
            arr = np.asarray(arr)
            if name == "model.embed_tokens.weight":
                p["embed"] = {"weight": arr}
            elif name == "model.norm.weight":
                p["final_norm"] = {"weight": arr}
            elif name.startswith("model.layers."):
                rest = name[len("model.layers."):]
                i_s, _, tail = rest.partition(".")
                staging.setdefault(i_s, {})[tail] = arr

        for i_s, tensors in staging.items():
            i = int(i_s)
            lay = p["layers"][i]

            def w(n):
                return get_kernel(tensors, n)

            lay["qkv"] = {"kernel": concat_cols(
                [w("self_attn.q_proj"), w("self_attn.k_proj"),
                 w("self_attn.v_proj")])}
            lay["o"] = {"kernel": w("self_attn.o_proj")}
            lay["gate_up"] = {"kernel": concat_cols(
                [w("mlp.gate_proj"), w("mlp.up_proj")])}
            lay["down"] = {"kernel": w("mlp.down_proj")}
            lay["input_ln"] = {"weight": tensors["input_layernorm.weight"]}
            lay["post_attn_ln"] = {
                "weight": tensors["post_attention_layernorm.weight"]}
            if self.gemma2:
                lay["pre_ffw_ln"] = {
                    "weight": tensors["pre_feedforward_layernorm.weight"]}
                lay["post_ffw_ln"] = {
                    "weight": tensors["post_feedforward_layernorm.weight"]}
            if self.decoder_layers[i].kv_scales is not None:
                lay["attn_scales"] = {
                    k: np.float32(np.asarray(tensors.get(
                        f"self_attn.{k[0]}_scale", 1.0)).reshape(()))
                    for k in ("k_scale", "v_scale")}
        return p


class Gemma2ForCausalLM(GemmaForCausalLM):
    gemma2 = True
    # Window applies only on even layers; odd layers are global attention,
    # so KV blocks must never be rotated/reused at the cache level (see
    # decoding/arg_utils._cache_level_sliding_window).
    interleaved_sliding_window = True
