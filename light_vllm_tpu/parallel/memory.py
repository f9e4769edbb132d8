"""Per-device memory planning for sharded deployments.

Answers "does this model fit at this mesh shape?" WITHOUT hardware:
weights + KV pool + activation working set per device, from the HF config
and the same sharding rules the worker applies (column/row-parallel
weights split tp ways, KV pages split over tp on the head axis and dp on
the page axis). Validated against XLA's own compiled memory analysis in
tests/parallel/test_memory_plan.py.

(SURVEY §7 stage 9 / north-star: Llama-3-70B FP8 at tp=8 on one v5e
host; reference has no analog — its GPU memory profiling is empirical,
decoding/worker gpu_worker.py determine_num_available_blocks.)
"""

from dataclasses import dataclass
from typing import Dict

V5E_HBM_BYTES = 16 * 1024 ** 3  # 16 GiB per v5e chip


@dataclass
class MemoryPlan:
    weights_per_device: int
    kv_bytes_per_block: int      # per device
    act_per_device: int          # peak activation working set (estimate)
    hbm_bytes: int
    reserve_frac: float

    @property
    def available_for_kv(self) -> int:
        return int(self.hbm_bytes * (1 - self.reserve_frac)
                   - self.weights_per_device - self.act_per_device)

    def max_blocks(self) -> int:
        return max(self.available_for_kv // self.kv_bytes_per_block, 0)

    def max_kv_tokens(self, block_size: int) -> int:
        return self.max_blocks() * block_size

    def fits(self, min_kv_tokens: int, block_size: int = 32) -> bool:
        return self.max_kv_tokens(block_size) >= min_kv_tokens

    def summary(self) -> Dict[str, float]:
        g = 1024 ** 3
        return dict(weights_gib=round(self.weights_per_device / g, 2),
                    act_gib=round(self.act_per_device / g, 2),
                    kv_gib=round(max(self.available_for_kv, 0) / g, 2),
                    max_blocks=self.max_blocks())


def param_count(cfg: dict) -> int:
    """Total parameter count of a Llama-family config (matmul weights +
    embeddings + norms)."""
    H = cfg["hidden_size"]
    L = cfg["num_hidden_layers"]
    I = cfg["intermediate_size"]
    V = cfg["vocab_size"]
    heads = cfg["num_attention_heads"]
    kvh = cfg.get("num_key_value_heads", heads)
    d = H // heads
    per_layer = (H * d * (heads + 2 * kvh)  # qkv
                 + heads * d * H            # o
                 + 3 * H * I                # gate/up/down
                 + 2 * H)                   # norms
    n_emb = 1 if cfg.get("tie_word_embeddings") else 2
    return L * per_layer + n_emb * V * H + H


def plan_memory(cfg: dict, *, tp: int = 1, dp: int = 1,
                weight_bytes: float = 2.0, kv_bytes: float = 2.0,
                block_size: int = 32, max_batched_tokens: int = 2048,
                hbm_bytes: int = V5E_HBM_BYTES,
                reserve_frac: float = 0.08) -> MemoryPlan:
    """Compile-free per-device memory plan.

    weight_bytes: 2.0 bf16, 1.0 fp8/int8 (+per-channel scales, counted),
    0.5 int4. kv_bytes: 2.0 bf16 cache, 1.0 fp8 cache.
    Sharding mirrors the worker: every matmul weight splits tp ways
    (column or row), embeddings split on vocab, norms replicate; KV
    pages split tp ways on the head axis and dp ways on the page axis
    (each device holds its dp partition's pool, so per-device KV bytes
    do not shrink with dp — dp adds pools).
    """
    H = cfg["hidden_size"]
    L = cfg["num_hidden_layers"]
    heads = cfg["num_attention_heads"]
    kvh = cfg.get("num_key_value_heads", heads)
    d = H // heads
    V = cfg["vocab_size"]
    I = cfg["intermediate_size"]

    sharded_params = param_count(cfg) - L * 2 * H - H  # minus norms
    norm_params = L * 2 * H + H
    weights = int(sharded_params / tp * weight_bytes
                  + norm_params * 4)  # norms ride f32, replicated
    if weight_bytes <= 1.0:
        # per-channel scales (f32, one per output channel), replicated
        # row dim / sharded col dim — small; count the unsharded bound.
        weights += int((L * (heads * d + 2 * kvh * d + H + 2 * I + H)
                        + 2 * V) * 4 / tp)

    # one KV block = block_size tokens x 2 x kvh/tp heads x d, all layers
    kv_block = int(block_size * 2 * max(kvh // tp, 1) * d * L * kv_bytes)

    # activation peak ~= the widest live set of one layer at the prefill
    # bucket: hidden + qkv/gate-up partials + logits row block. The 3x
    # multiplier absorbs XLA temporaries (validated within 2x against
    # compiled memory_analysis on small shapes).
    act = int(max_batched_tokens * max(H + (heads + 2 * kvh) * d / tp,
                                       H + 2 * I / tp) * 2 * 3
              + max_batched_tokens * V / tp * 4)

    return MemoryPlan(weights_per_device=weights,
                      kv_bytes_per_block=kv_block,
                      act_per_device=act, hbm_bytes=hbm_bytes,
                      reserve_frac=reserve_frac)


def llama3_70b_config() -> dict:
    return dict(architectures=["LlamaForCausalLM"],
                vocab_size=128256, hidden_size=8192,
                num_hidden_layers=80, num_attention_heads=64,
                num_key_value_heads=8, intermediate_size=28672,
                max_position_embeddings=8192, rms_norm_eps=1e-5,
                rope_theta=500000.0, hidden_act="silu",
                tie_word_embeddings=False)
