"""np-cache loader: checkpoint → .npy cache → identical outputs
(reference: core/loader/weight_utils.py:58-69 np-cache + :329 lock)."""

import json
import os

import numpy as np
import pytest

from tests.decoding.test_generate_e2e import (hf_greedy,  # noqa: F401
                                              tiny_qwen2,
                                              tiny_qwen2_config)


@pytest.fixture
def checkpoint_dir(tiny_qwen2, tmp_path):  # noqa: F811
    """Tiny Qwen2 saved as a local HF checkpoint directory."""
    cfg, hf_model = tiny_qwen2
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    return str(tmp_path)


def test_np_cache_loader_matches(tiny_qwen2, checkpoint_dir):  # noqa: F811
    cfg, hf_model = tiny_qwen2
    from light_vllm_tpu import LLM, SamplingParams

    kwargs = dict(dtype="float32", max_model_len=128, block_size=16,
                  num_device_blocks_override=128, max_num_seqs=8)
    rng = np.random.default_rng(9)
    prompt = {"prompt_token_ids": rng.integers(3, 250, size=9).tolist()}
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    ref = hf_greedy(hf_model, prompt["prompt_token_ids"], 8)

    # First load populates the cache.
    from light_vllm_tpu.core.processor.tokenizer import NullHFTokenizer

    llm = LLM(model=checkpoint_dir, tokenizer_override=NullHFTokenizer(),
              load_format="np_cache", **kwargs)
    assert llm.generate([prompt], sp)[0].outputs[0].token_ids == ref
    cache = os.path.join(checkpoint_dir, "np_cache")
    manifest = os.path.join(cache, "manifest.json")
    assert os.path.exists(manifest)
    names = json.load(open(manifest))
    assert len(names) > 0
    assert all(os.path.exists(os.path.join(cache, f"{i}.npy"))
               for i in range(len(names)))

    # Second load streams from the cache (poison the safetensors file to
    # prove the cache is actually used).
    st = [f for f in os.listdir(checkpoint_dir)
          if f.endswith(".safetensors")]
    for f in st:
        os.rename(os.path.join(checkpoint_dir, f),
                  os.path.join(checkpoint_dir, f + ".moved"))
    llm2 = LLM(model=checkpoint_dir, tokenizer_override=NullHFTokenizer(),
               load_format="np_cache", **kwargs)
    assert llm2.generate([prompt], sp)[0].outputs[0].token_ids == ref
