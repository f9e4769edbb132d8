"""Device-side sampling pipeline (pure jnp, fully vectorized over seq slots).

Counterpart of the reference's GPU sampler (reference:
light_vllm/decoding/backends/sampler.py:34-202 + Triton ops/sample.py):
penalties → temperature → top-k/top-p/min-p → gumbel sampling, plus chosen
logprob and optional top-k logprobs. Everything is branchless under jit;
host passes static flags that select the cheapest adequate variant (e.g.
skip the vocab sort when no request uses top-k/p).

Greedy is temperature == 0 (mask handled by jnp.where, no separate path).
"""

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


class SampleResult(NamedTuple):
    next_tokens: jnp.ndarray      # [S] int32
    chosen_logprobs: jnp.ndarray  # [S] f32
    topk_logprobs: Optional[jnp.ndarray]  # [S, K] f32 or None
    topk_ids: Optional[jnp.ndarray]       # [S, K] int32 or None


def apply_penalties(logits: jnp.ndarray, output_tokens: jnp.ndarray,
                    prompt_tokens: Optional[jnp.ndarray],
                    presence: jnp.ndarray, frequency: jnp.ndarray,
                    repetition: jnp.ndarray) -> jnp.ndarray:
    """output_tokens/prompt_tokens: [S, L] padded with vocab_size (=ignore).

    presence/frequency act on *output* counts; repetition acts on any token
    seen in prompt or output (HF semantics, matching the reference sampler).
    """
    S, V = logits.shape
    ignore = V  # pad id == vocab_size

    def count_hist(tokens):
        one = jnp.where(tokens < ignore, 1, 0)
        hist = jnp.zeros((S, V + 1), jnp.int32)
        hist = hist.at[jnp.arange(S)[:, None], tokens].add(one)
        return hist[:, :V]

    out_counts = count_hist(output_tokens)
    seen = out_counts > 0
    if prompt_tokens is not None:
        seen = seen | (count_hist(prompt_tokens) > 0)

    logits = logits - frequency[:, None] * out_counts
    logits = logits - presence[:, None] * (out_counts > 0)
    rep = repetition[:, None]
    logits = jnp.where(seen,
                       jnp.where(logits > 0, logits / rep, logits * rep),
                       logits)
    return logits


def apply_top_k_top_p_min_p(logits: jnp.ndarray, top_k: jnp.ndarray,
                            top_p: jnp.ndarray, min_p: jnp.ndarray
                            ) -> jnp.ndarray:
    """Mask logits outside the per-row nucleus. One descending sort serves
    top-k (rank cutoff), top-p (cumulative prob cutoff) and min-p."""
    S, V = logits.shape
    sorted_logits = -jnp.sort(-logits, axis=-1)  # descending

    # top-k: threshold = k-th largest logit (k=0 → off)
    k = jnp.where(top_k > 0, top_k, V).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_logits,
                              jnp.clip(k[:, None] - 1, 0, V - 1), axis=-1)
    logits = jnp.where(logits < kth, NEG_INF, logits)

    # top-p on the sorted distribution: find the smallest logit kept
    probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # keep tokens while cumulative prob (exclusive) < top_p
    keep_sorted = (cum - probs_sorted) < top_p[:, None]
    # threshold = last kept sorted logit
    num_keep = jnp.maximum(jnp.sum(keep_sorted, axis=-1), 1)
    pth = jnp.take_along_axis(sorted_logits, num_keep[:, None] - 1, axis=-1)
    logits = jnp.where(logits < pth, NEG_INF, logits)

    # min-p: drop tokens below min_p * max_prob
    probs = jax.nn.softmax(logits, axis=-1)
    max_p = jnp.max(probs, axis=-1, keepdims=True)
    logits = jnp.where(probs < min_p[:, None] * max_p, NEG_INF, logits)
    return logits


def apply_min_tokens_ban(logits: jnp.ndarray, ban_tokens: jnp.ndarray,
                         ban_active: jnp.ndarray) -> jnp.ndarray:
    """Mask EOS/stop token ids while a row hasn't produced min_tokens yet
    (reference: sampler.py _apply_min_tokens_penalty).

    ban_tokens [S, B] i32 padded with -1; ban_active [S] i32 (1 = still
    under min_tokens).
    """
    S, V = logits.shape
    rows = jnp.arange(S, dtype=jnp.int32)[:, None]
    cols = jnp.clip(ban_tokens, 0, V - 1)
    delta = jnp.where((ban_tokens >= 0) & (ban_active[:, None] > 0),
                      NEG_INF, 0.0)
    return logits.at[rows, cols].add(delta)


@partial(jax.jit, static_argnames=("use_penalties", "use_topkp",
                                   "num_logprobs", "all_greedy",
                                   "need_chosen_logprobs"))
def sample(logits: jnp.ndarray,
           temperature: jnp.ndarray,
           top_k: jnp.ndarray, top_p: jnp.ndarray, min_p: jnp.ndarray,
           presence: jnp.ndarray, frequency: jnp.ndarray,
           repetition: jnp.ndarray,
           output_tokens: jnp.ndarray,
           prompt_tokens: Optional[jnp.ndarray],
           seeds: jnp.ndarray,
           ban_tokens: Optional[jnp.ndarray] = None,
           ban_active: Optional[jnp.ndarray] = None,
           *, use_penalties: bool, use_topkp: bool,
           num_logprobs: int = 0, all_greedy: bool = False,
           need_chosen_logprobs: bool = True) -> SampleResult:
    """logits [S, V] f32 → sampled token per row.

    Static flags prune whole phases: all_greedy skips the (expensive)
    per-row threefry gumbel noise; need_chosen_logprobs=False skips the
    log-softmax when the caller doesn't consume cumulative logprobs.
    """
    logits = logits.astype(jnp.float32)
    if use_penalties:
        logits = apply_penalties(logits, output_tokens, prompt_tokens,
                                 presence, frequency, repetition)
    if ban_tokens is not None:
        logits = apply_min_tokens_ban(logits, ban_tokens, ban_active)

    greedy_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if all_greedy:
        next_tokens = greedy_tokens
        final_logits = logits  # greedy logprobs are reported at T=1
    else:
        # Greedy rows keep T=1 so their reported logprobs match the raw
        # distribution (reference: temperature forced to 1.0 for greedy).
        eff_temp = jnp.where(temperature < 1e-5, 1.0, temperature)[:, None]
        scaled = logits / eff_temp
        if use_topkp:
            scaled = apply_top_k_top_p_min_p(scaled, top_k, top_p, min_p)
        # Gumbel-max sampling with per-row seeds.
        base = jax.random.key(0)
        gumbel = jax.vmap(lambda s: jax.random.gumbel(
            jax.random.fold_in(base, s), (logits.shape[-1],), jnp.float32))(
                seeds.astype(jnp.uint32))
        random_tokens = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
        is_greedy = temperature < 1e-5
        next_tokens = jnp.where(is_greedy, greedy_tokens, random_tokens)
        final_logits = scaled

    if need_chosen_logprobs or num_logprobs > 0:
        # Logprobs reflect the distribution actually sampled from:
        # post-penalty, post-temperature, post-top-k/p masking (reference:
        # sampler.py computes log_softmax after all logits processing).
        logz = jax.nn.log_softmax(final_logits, axis=-1)
        chosen_logprobs = jnp.take_along_axis(
            logz, next_tokens[:, None], axis=-1)[:, 0]
    else:
        chosen_logprobs = jnp.zeros(logits.shape[0], jnp.float32)

    if num_logprobs > 0:
        topk_lp, topk_ids = jax.lax.top_k(logz, num_logprobs)
        return SampleResult(next_tokens, chosen_logprobs, topk_lp,
                            topk_ids.astype(jnp.int32))
    return SampleResult(next_tokens, chosen_logprobs, None, None)


def compute_greedy(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)


def prompt_logprobs(compute_logits_fn, hidden: jnp.ndarray,
                    targets: jnp.ndarray, k: int, chunk: int = 256):
    """Per-position prompt logprobs over the full token region.

    The [T, V] logits would be GBs at serving shapes (T=2048, V=152k,
    f32), so the log-softmax runs chunked via lax.map: each chunk gathers
    its hidden rows, projects through the LM head, and keeps only the
    target logprob (+ optional top-k) — peak extra memory is one
    [chunk, V] slab. targets[t] is the NEXT prompt token at row t (-1 =
    not requested; gather still runs, host discards).

    Returns (chosen [T] f32, topk_lp [T, k] f32 | None, topk_ids | None).
    (reference: decoding/backends/sampler.py get_logprobs prompt path)
    """
    T = hidden.shape[0]
    C = min(chunk, T)
    while T % C:
        C -= 1
    idx = jnp.arange(T, dtype=jnp.int32).reshape(T // C, C)
    tg = targets.reshape(T // C, C)

    def one(args):
        ix, t = args
        logits = compute_logits_fn(hidden, ix).astype(jnp.float32)
        logz = jax.nn.log_softmax(logits, axis=-1)
        chosen = jnp.take_along_axis(
            logz, jnp.clip(t, 0, None)[:, None], axis=-1)[:, 0]
        if k > 0:
            tlp, tids = jax.lax.top_k(logz, k)
            return chosen, tlp, tids.astype(jnp.int32)
        return chosen

    out = jax.lax.map(one, (idx, tg))
    if k > 0:
        chosen, tlp, tids = out
        return (chosen.reshape(T), tlp.reshape(T, k), tids.reshape(T, k))
    return out.reshape(T), None, None
