"""Component-level attribution of the BGE-M3 encode forward (r5).

The e2e profile (profile_encode.py) shows the jitted forward itself at
0.18 MFU (562 ms for a ~100 ms-at-peak batch); engine overhead is 13 ms.
This times each suspect at the bench shape (B=64, L=512, XLM-R-large):

    python benchmarks/profile_encode_fwd.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lvt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    B, L, H, I, heads, d, layers, V = 64, 512, 1024, 4096, 16, 64, 24, 250002
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, H)) * 0.02, jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, V - 2, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    emb_w = jnp.asarray(rng.standard_normal((V, H)) * 0.02, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.bfloat16)
    wup = jnp.asarray(rng.standard_normal((H, I)) * 0.02, jnp.bfloat16)
    wdn = jnp.asarray(rng.standard_normal((I, H)) * 0.02, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, L, heads, d)) * 0.2,
                    jnp.bfloat16)

    wqkv_h = jnp.asarray(rng.standard_normal((3 * H, H)) * 0.02,
                         jnp.bfloat16)

    # Weights ride as ARGUMENTS, not jit closure constants — a closed-over
    # array is baked into the HLO and blows the remote-compile payload
    # limit (observed HTTP 413 with the 512 MB embedding table).
    @jax.jit
    def matmul_tower(x, wqkv, wqkv_h, wup, wdn):
        for _ in range(layers):
            x = x @ wqkv @ wqkv_h + x
            x = (x @ wup) @ wdn + x
        return x

    @jax.jit
    def gelu_tower(x, wup, wdn):
        for _ in range(layers):
            h = jax.nn.gelu(x @ wup, approximate=False) @ wdn
            x = x + h
        return x

    @jax.jit
    def ln_tower(x):
        for _ in range(layers * 2):
            xf = x.astype(jnp.float32)
            m = jnp.mean(xf, -1, keepdims=True)
            v = jnp.mean(jnp.square(xf - m), -1, keepdims=True)
            x = ((xf - m) / jnp.sqrt(v + 1e-5)).astype(jnp.bfloat16)
        return x

    from light_vllm_tpu.ops.flash_attention import flash_attention_dense
    from light_vllm_tpu.ops.attention_ref import dense_attention

    @jax.jit
    def attn_pallas(q):
        o = q
        for _ in range(layers):
            o = flash_attention_dense(o, o, o, mask)
        return o

    @jax.jit
    def attn_ref(q):
        o = q
        for _ in range(layers):
            o = dense_attention(o, o, o, mask.astype(bool), causal=False)
        return o

    @jax.jit
    def embed(emb_w, ids):
        return jnp.take(emb_w, ids, axis=0)

    peak = 197e12
    mm_flops = 2 * layers * B * L * (2 * 3 * H * H + 2 * H * I)
    for name, fn, args, flops in [
            ("embedding gather 250k-vocab", embed, (emb_w, ids), 0),
            ("matmul tower (qkv+o+mlp x24)", matmul_tower,
             (x, wqkv, wqkv_h, wup, wdn), mm_flops),
            ("gelu-exact tower (up+act+down x24)", gelu_tower,
             (x, wup, wdn), None),
            ("layernorm tower (x48)", ln_tower, (x,), 0),
            ("attention pallas x24", attn_pallas, (q,), None),
            ("attention xla-ref x24", attn_ref, (q,), None),
    ]:
        ms = timeit(fn, *args)
        note = f"  MFU {flops / (ms / 1e3) / peak:.3f}" if flops else ""
        print(f"{name:38s} {ms:8.1f} ms{note}")


if __name__ == "__main__":
    main()
