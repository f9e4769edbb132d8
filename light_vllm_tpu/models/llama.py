"""Llama-family causal LM (Llama 2/3, Mistral) on the TPU layer stack.

Counterpart of the reference's Qwen2 decode model (reference:
light_vllm/decode_only/modelzoo/qwen2.py:80-419; Llama is the flagship for
BASELINE.json's Llama-3-8B target). Forward operates on the flattened ragged
batch: input_ids [T], positions [T], paged KV caches per layer, attention
metadata. Everything is pure → jit-able with donated caches.

Also exposes `encode_forward` (dense [B, L], no cache) so the same model can
serve decoder-as-embedder workloads (reference:
light_vllm/decode_only/output_last_hidden_states/).
"""

from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from light_vllm_tpu import envs
from light_vllm_tpu.decoding.attention import (Attention,
                                               DecodeAttnMetadata, KVScales)
from light_vllm_tpu.layers.activation import get_gated_act_fn
from light_vllm_tpu.layers.base import (Layer, stack_layer_params,
                                        stack_layer_specs, tree_specs)
from light_vllm_tpu.layers.embedding import ParallelLMHead, \
    VocabParallelEmbedding
from light_vllm_tpu.layers.linear import (MergedColumnParallelLinear,
                                          QKVParallelLinear,
                                          RowParallelLinear)
from light_vllm_tpu.layers.norm import RMSNorm
from light_vllm_tpu.layers.rotary import get_rope
from light_vllm_tpu.ops.attention_ref import dense_attention


class LlamaDecoderLayer:

    def __init__(self, cfg, dtype, attn_backend, *, qkv_bias: bool = False,
                 max_position: int = 4096, rope_scaling=None,
                 rope_theta: float = 10000.0, quant_config=None) -> None:
        H = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = getattr(cfg, "num_key_value_heads",
                                    None) or self.num_heads
        self.head_dim = getattr(cfg, "head_dim", None) or H // self.num_heads
        inter = cfg.intermediate_size

        def qm():
            return quant_config.get_linear_method() if quant_config else None

        self.qkv = QKVParallelLinear(H, self.head_dim, self.num_heads,
                                     self.num_kv_heads, bias=qkv_bias,
                                     dtype=dtype, quant_method=qm())
        self.o = RowParallelLinear(self.num_heads * self.head_dim, H,
                                   bias=False, dtype=dtype,
                                   quant_method=qm())
        self.gate_up = MergedColumnParallelLinear(H, [inter, inter],
                                                  bias=False, dtype=dtype,
                                                  quant_method=qm())
        self.down = RowParallelLinear(inter, H, bias=False, dtype=dtype,
                                      quant_method=qm())
        self.act = get_gated_act_fn(getattr(cfg, "hidden_act", "silu"))
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        self.input_ln = RMSNorm(H, eps=eps, dtype=dtype)
        self.post_attn_ln = RMSNorm(H, eps=eps, dtype=dtype)
        self.rope = get_rope(self.head_dim, self.head_dim, max_position,
                             rope_theta, is_neox_style=True,
                             rope_scaling=rope_scaling, dtype=dtype)
        if attn_backend is not None:
            self.attn = Attention(
                self.num_heads, self.head_dim, self.num_kv_heads,
                scale=self.head_dim ** -0.5, backend=attn_backend,
                sliding_window=getattr(cfg, "sliding_window", None))
            # embedder mode hands an encoder backend with no KV cache
            self.kv_scales = KVScales() if getattr(
                attn_backend, "needs_kv_scales", False) else None
        else:
            self.attn = None
            self.kv_scales = None

    def layer_tree(self):
        tree = {"qkv": self.qkv, "o": self.o, "gate_up": self.gate_up,
                "down": self.down, "input_ln": self.input_ln,
                "post_attn_ln": self.post_attn_ln}
        if self.kv_scales is not None:
            tree["attn_scales"] = self.kv_scales
        return tree

    def __call__(self, p, x, positions, kv_cache,
                 meta: DecodeAttnMetadata, layer_idx=None):
        """x [T, H] flattened ragged batch; kv_cache is this layer's
        [slots, ...] pages, or the full stacked cache + layer_idx under
        scan."""
        residual = x
        x = self.input_ln(p["input_ln"], x)
        qkv = self.qkv(p["qkv"], x)
        q, k, v = self.qkv.split_qkv(qkv)
        q, k = self.rope(positions, q, k)
        attn_out, kv_cache = self.attn(q, k, v, kv_cache, meta, layer_idx,
                                       scales=p.get("attn_scales"))
        x = residual + self.o(p["o"], attn_out)
        residual = x
        x = self.post_attn_ln(p["post_attn_ln"], x)
        x = residual + self.down(p["down"], self._mlp_act(p, x))
        return x, kv_cache

    def _mlp_act(self, p, x):
        from light_vllm_tpu.layers.linear import gated_mlp_act
        return gated_mlp_act(self.act, self.gate_up, p["gate_up"], x)

    def encode_call(self, p, x, positions, mask, causal: bool):
        """Dense [B, L, H] forward without KV cache (embedder mode)."""
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
                               scale=self.head_dim ** -0.5)
        attn = attn.reshape(B, L, self.num_heads * self.head_dim)
        x = residual + self.o(p["o"], attn)
        residual = x
        x = self.post_attn_ln(p["post_attn_ln"], x)
        x = residual + self.down(p["down"],
                                 self.act(self.gate_up(p["gate_up"], x)))
        return x


class LlamaForCausalLM:
    """HF arch names: LlamaForCausalLM, MistralForCausalLM."""

    qkv_bias = False
    encode_causal = True
    # All decoder layers are structurally identical → the forward can
    # lax.scan over stacked [L, ...] params + KV, so each executable
    # compiles ONE layer body instead of num_layers unrolled copies
    # (the compile-time fix; interleaved models like Gemma2 override).
    supports_scan = True

    def __init__(self, model_config, attn_backend=None) -> None:
        cfg = model_config.hf_config
        dtype = model_config.dtype
        self.cfg = cfg
        self.dtype = dtype
        self.model_config = model_config
        H = cfg.hidden_size
        self.tie_word_embeddings = bool(getattr(cfg, "tie_word_embeddings",
                                                False))
        rope_theta = getattr(cfg, "rope_theta", None) or 10000.0
        rope_scaling = getattr(cfg, "rope_scaling", None)
        max_pos = model_config.max_model_len
        from light_vllm_tpu.layers.quant import quant_config_from_model_config

        quant_config = quant_config_from_model_config(model_config)
        self.embed = VocabParallelEmbedding(cfg.vocab_size, H, dtype=dtype)
        self.decoder_layers = [
            LlamaDecoderLayer(cfg, dtype, attn_backend,
                              qkv_bias=self.qkv_bias, max_position=max_pos,
                              rope_scaling=rope_scaling,
                              rope_theta=rope_theta,
                              quant_config=quant_config)
            for _ in range(cfg.num_hidden_layers)
        ]
        self.final_norm = RMSNorm(H, eps=getattr(cfg, "rms_norm_eps", 1e-6),
                                  dtype=dtype)
        self.lm_head = ParallelLMHead(cfg.vocab_size, H, dtype=dtype)
        self.num_layers = cfg.num_hidden_layers
        self.scan_layers = bool(envs.LVT_SCAN_LAYERS and self.supports_scan
                                and self.num_layers > 1)

    # --- params -------------------------------------------------------------
    def layer_tree(self):
        tree = {
            "embed": self.embed,
            "layers": [l.layer_tree() for l in self.decoder_layers],
            "final_norm": self.final_norm,
        }
        if not self.tie_word_embeddings:
            tree["lm_head"] = self.lm_head
        return tree

    def specs(self):
        tree = tree_specs(self.layer_tree())
        if self.scan_layers:
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
            params["layers"] = stack_layer_params(params["layers"])
        return params

    # --- decode forward ------------------------------------------------------
    def __call__(self, params, input_ids, positions, kv_caches,
                 meta: DecodeAttnMetadata):
        """Returns (hidden [T, H], new_kv_caches).

        kv_caches: stacked [L, slots, 2*kvh, d] array when scan_layers,
        else a per-layer list of [slots, 2*kvh, d] arrays."""
        x = self.embed(params["embed"], input_ids)
        if self.scan_layers:
            from light_vllm_tpu.models.scan_utils import scan_decoder_layers

            x, kv_caches = scan_decoder_layers(
                self.decoder_layers, params["layers"], x, kv_caches,
                lambda layer, p, x, kv, l: layer(p, x, positions, kv,
                                                 meta, l))
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
        """Gather last-token rows then project to vocab (f32)."""
        rows = hidden[logits_indices]  # [S, H]
        w = params["embed"]["weight"] if self.tie_word_embeddings else None
        logits = self.lm_head(params.get("lm_head", {}), rows,
                              embedding_weight=w)
        return logits[:, :self.cfg.vocab_size]

    # --- embedder mode -------------------------------------------------------
    def encode_forward(self, params, input_ids, positions, mask):
        x = self.embed(params["embed"], input_ids)
        if self.scan_layers:
            from light_vllm_tpu.models.scan_utils import scan_encode_layers

            x = scan_encode_layers(
                self.decoder_layers, params["layers"], x,
                lambda layer, p, x: layer.encode_call(
                    p, x, positions, mask, causal=self.encode_causal))
        else:
            for layer, p in zip(self.decoder_layers, params["layers"]):
                x = layer.encode_call(p, x, positions, mask,
                                      causal=self.encode_causal)
        x = self.final_norm(params["final_norm"], x)
        return {"hidden_states": x, "pooled_output": None}

    # --- weight loading --------------------------------------------------------
    hf_layer_prefix = "model.layers."

    def load_weights(self, weights: Iterator[Tuple[str, np.ndarray]]):
        """Stream HF checkpoint → fused numpy param tree with stacked-param
        mapping (q,k,v → qkv; gate,up → gate_up), the same contract as the
        reference's per-model load_weights (reference: qwen2.py:378-419)."""
        L = self.num_layers
        p: Dict[str, Any] = {
            "layers": [dict() for _ in range(L)],
        }
        staging: Dict[str, Dict[str, np.ndarray]] = {}

        def set_layer(i, key, sub, arr):
            p["layers"][i].setdefault(key, {})[sub] = arr

        for name, arr in weights:
            arr = np.asarray(arr)
            if name == "model.embed_tokens.weight":
                p["embed"] = {"weight": arr}
            elif name == "model.norm.weight":
                p["final_norm"] = {"weight": arr}
            elif name == "lm_head.weight":
                if not self.tie_word_embeddings:
                    p["lm_head"] = {"weight": arr}
            elif name.startswith(self.hf_layer_prefix):
                rest = name[len(self.hf_layer_prefix):]
                idx_s, _, tail = rest.partition(".")
                i = int(idx_s)
                staging.setdefault(str(i), {})[tail] = arr

        from light_vllm_tpu.layers.quant.ingest import concat_cols, get_kernel

        for i_s, tensors in staging.items():
            i = int(i_s)

            def w(n):
                # float .weight ([out,in] → [in,out]) or GPTQ/AWQ triple
                return get_kernel(tensors, n)

            def b(n):
                return tensors.get(n + ".bias")

            qkv_k = concat_cols([w("self_attn.q_proj"),
                                 w("self_attn.k_proj"),
                                 w("self_attn.v_proj")])
            set_layer(i, "qkv", "kernel", qkv_k)
            if b("self_attn.q_proj") is not None:
                set_layer(i, "qkv", "bias", np.concatenate(
                    [b("self_attn.q_proj"), b("self_attn.k_proj"),
                     b("self_attn.v_proj")]))
            set_layer(i, "o", "kernel", w("self_attn.o_proj"))
            set_layer(i, "gate_up", "kernel", concat_cols(
                [w("mlp.gate_proj"), w("mlp.up_proj")]))
            set_layer(i, "down", "kernel", w("mlp.down_proj"))
            set_layer(i, "input_ln", "weight",
                      tensors["input_layernorm.weight"])
            set_layer(i, "post_attn_ln", "weight",
                      tensors["post_attention_layernorm.weight"])
            if self.decoder_layers[i].kv_scales is not None:
                # fp8-KV dequant scales: quantized checkpoints ship them as
                # self_attn.{k,v}_scale (or attn.{k,v}_scale / the legacy
                # shared kv_scale); default 1.0 (reference:
                # weight_utils.py:411-450, loader.py:313).
                def scale_of(which):
                    for key in (f"self_attn.{which}_scale",
                                f"self_attn.attn.{which}_scale",
                                "self_attn.kv_scale"):
                        if key in tensors:
                            return np.float32(
                                np.asarray(tensors[key]).reshape(()))
                    return np.float32(1.0)

                set_layer(i, "attn_scales", "k_scale", scale_of("k"))
                set_layer(i, "attn_scales", "v_scale", scale_of("v"))
        if self.tie_word_embeddings:
            p.pop("lm_head", None)
        elif "lm_head" not in p:
            # Some checkpoints tie implicitly: reuse the embedding.
            p["lm_head"] = {"weight": p["embed"]["weight"].copy()}
        return p
