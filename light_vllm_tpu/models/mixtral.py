"""Mixtral (MoE Llama) — Llama attention + FusedMoE FFN.

(reference capability: light_vllm/backends/fused_moe/; arch follows HF
MixtralForCausalLM)
"""

from typing import Any, Dict, Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from light_vllm_tpu.layers.moe import FusedMoE
from light_vllm_tpu.models.llama import LlamaDecoderLayer, LlamaForCausalLM


class MixtralDecoderLayer(LlamaDecoderLayer):

    def __init__(self, cfg, dtype, attn_backend, **kwargs):
        super().__init__(cfg, dtype, attn_backend, **kwargs)
        self.moe = FusedMoE(
            num_experts=cfg.num_local_experts,
            top_k=cfg.num_experts_per_tok,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            dtype=dtype)

    def layer_tree(self):
        tree = super().layer_tree()
        # MoE replaces the dense MLP
        tree.pop("gate_up")
        tree.pop("down")
        tree["moe"] = self.moe
        return tree

    def __call__(self, p, x, positions, kv_cache, meta, layer_idx=None):
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
        x = residual + self.moe(p["moe"], x)
        return x, kv_cache

    def encode_call(self, p, x, positions, mask, causal):
        """Dense [B, L, H] forward without KV cache (embedder mode) — the
        Llama embedder path with the MLP swapped for MoE (reference analog:
        the decode_only last-hidden workflow over any causal LM)."""
        from light_vllm_tpu.models.llama import dense_attention

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
        x = residual + self.moe(p["moe"], x.reshape(B * L, H)).reshape(
            B, L, H)
        return x


class MixtralForCausalLM(LlamaForCausalLM):

    def __init__(self, model_config, attn_backend=None):
        # Build with Llama scaffolding, then swap in MoE layers.
        super().__init__(model_config, attn_backend)
        cfg = model_config.hf_config
        rope_theta = getattr(cfg, "rope_theta", None) or 1e6
        self.decoder_layers = [
            MixtralDecoderLayer(cfg, self.dtype, attn_backend,
                                qkv_bias=False,
                                max_position=model_config.max_model_len,
                                rope_scaling=getattr(cfg, "rope_scaling",
                                                     None),
                                rope_theta=rope_theta)
            for _ in range(cfg.num_hidden_layers)
        ]

    def load_weights(self, weights: Iterator[Tuple[str, np.ndarray]]):
        """Stack per-expert HF tensors into fused [E, ...] arrays."""
        L = self.num_layers
        cfg = self.cfg
        E = cfg.num_local_experts
        p: Dict[str, Any] = {"layers": [dict() for _ in range(L)]}
        staged: Dict[int, Dict[str, np.ndarray]] = {}

        for name, arr in weights:
            arr = np.asarray(arr)
            if name == "model.embed_tokens.weight":
                p["embed"] = {"weight": arr}
            elif name == "model.norm.weight":
                p["final_norm"] = {"weight": arr}
            elif name == "lm_head.weight":
                p["lm_head"] = {"weight": arr}
            elif name.startswith("model.layers."):
                rest = name[len("model.layers."):]
                i_s, _, tail = rest.partition(".")
                staged.setdefault(int(i_s), {})[tail] = arr

        for i, t in staged.items():
            def w(n):
                return t[n + ".weight"].T

            lay = p["layers"][i]
            lay["qkv"] = {"kernel": np.concatenate(
                [w("self_attn.q_proj"), w("self_attn.k_proj"),
                 w("self_attn.v_proj")], axis=1)}
            lay["o"] = {"kernel": w("self_attn.o_proj")}
            lay["input_ln"] = {"weight": t["input_layernorm.weight"]}
            lay["post_attn_ln"] = {
                "weight": t["post_attention_layernorm.weight"]}
            w13 = np.stack([
                np.concatenate([w(f"block_sparse_moe.experts.{e}.w1"),
                                w(f"block_sparse_moe.experts.{e}.w3")],
                               axis=1)
                for e in range(E)])
            w2 = np.stack([w(f"block_sparse_moe.experts.{e}.w2")
                           for e in range(E)])
            lay["moe"] = {"router": w("block_sparse_moe.gate"),
                          "w13": w13, "w2": w2}
            if self.decoder_layers[i].kv_scales is not None:
                lay["attn_scales"] = {
                    k: np.float32(np.asarray(t.get(
                        f"self_attn.{k[0]}_scale", 1.0)).reshape(()))
                    for k in ("k_scale", "v_scale")}
        if "lm_head" not in p:
            p["lm_head"] = {"weight": p["embed"]["weight"].copy()}
        return p
