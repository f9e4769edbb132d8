"""Golden encode-only e2e: tiny randomly-initialized HF BertModel (torch CPU)
vs our engine on the same weights — the offline version of the reference's
hf_runner/vllm_runner comparison tests (reference: tests/encode_only/models/
test_bert.py). No network: the HF model is built from a config."""

import numpy as np
import pytest

from tests.conftest import make_tiny_bert_config

# Bare "BertModel" architectures route to the retriever task (real
# checkpoint behavior); raw hidden states need the workflow override.
ENCODE_WF = "light_vllm_tpu.encode_only.workflow:EncodeOnlyWorkflow"


@pytest.fixture(scope="module")
def tiny_bert():
    import torch
    from transformers import BertConfig, BertModel

    cfg = BertConfig(**{k: v for k, v in make_tiny_bert_config().items()
                        if k != "architectures"})
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.eval()
    return cfg, model


def test_bert_hidden_states_match_hf(tiny_bert):
    import torch

    cfg, hf_model = tiny_bert
    from light_vllm_tpu import LLM

    state_dict = hf_model.state_dict()
    llm = LLM(workflow=ENCODE_WF,
              hf_config=make_tiny_bert_config(),
              state_dict=state_dict,
              dtype="float32",
              max_model_len=64,
              max_num_requests=4)

    rng = np.random.default_rng(0)
    prompts = []
    lens = [5, 9, 17]
    for n in lens:
        ids = rng.integers(3, 100, size=n).tolist()
        prompts.append({"prompt_token_ids": ids})

    outs = llm.encode(prompts)
    assert len(outs) == len(prompts)

    for out, prompt in zip(outs, prompts):
        ids = prompt["prompt_token_ids"]
        with torch.no_grad():
            hf_out = hf_model(
                input_ids=torch.tensor([ids]),
                attention_mask=torch.ones(1, len(ids), dtype=torch.long))
        hf_hidden = hf_out.last_hidden_state[0].numpy()
        ours = np.asarray(out.embedding, dtype=np.float32)
        assert ours.shape == hf_hidden.shape
        np.testing.assert_allclose(ours, hf_hidden, rtol=2e-2, atol=2e-2)


def test_bert_batching_matches_single(tiny_bert):
    cfg, hf_model = tiny_bert
    from light_vllm_tpu import LLM

    llm = LLM(workflow=ENCODE_WF,
              hf_config=make_tiny_bert_config(),
              state_dict=hf_model.state_dict(),
              dtype="float32", max_model_len=64, max_num_requests=8)

    rng = np.random.default_rng(1)
    prompts = [{"prompt_token_ids": rng.integers(3, 100, size=n).tolist()}
               for n in [4, 4, 8, 12]]
    batch_outs = llm.encode(prompts)
    single_outs = [llm.encode([p])[0] for p in prompts]
    for b, s in zip(batch_outs, single_outs):
        np.testing.assert_allclose(
            np.asarray(b.embedding), np.asarray(s.embedding),
            rtol=1e-4, atol=1e-4)


def test_bert_pallas_backend_matches_hf(tiny_bert, monkeypatch):
    """Same parity through the Pallas flash-attention encoder backend
    (interpret mode on CPU; VERDICT r1 #9 encoder fast path)."""
    import torch

    monkeypatch.setenv("LVT_ATTENTION_BACKEND", "pallas")
    cfg, hf_model = tiny_bert
    from light_vllm_tpu import LLM

    llm = LLM(workflow=ENCODE_WF,
              hf_config=make_tiny_bert_config(),
              state_dict=hf_model.state_dict(), dtype="float32",
              max_model_len=64, max_num_requests=4)
    rng = np.random.default_rng(1)
    prompts = [{"prompt_token_ids": rng.integers(3, 100, size=n).tolist()}
               for n in [6, 20]]
    outs = llm.encode(prompts)
    for out, prompt in zip(outs, prompts):
        ids = prompt["prompt_token_ids"]
        with torch.no_grad():
            hf_hidden = hf_model(
                input_ids=torch.tensor([ids]),
                attention_mask=torch.ones(1, len(ids), dtype=torch.long)
            ).last_hidden_state[0].numpy()
        np.testing.assert_allclose(np.asarray(out.embedding, np.float32),
                                   hf_hidden, rtol=2e-2, atol=2e-2)


def test_over_length_prompt_returns_none_embedding(tiny_bert):
    """An over-max_model_len prompt is ignored, not crashed on — and even
    an ignored-ONLY batch emits a finished output with embedding=None
    (improves on reference prefill_only/schema/engine_io.py:36-37, which
    silently drops such a batch)."""
    cfg, hf_model = tiny_bert
    from light_vllm_tpu import LLM

    llm = LLM(workflow=ENCODE_WF,
              hf_config=make_tiny_bert_config(),
              state_dict=hf_model.state_dict(),
              dtype="float32", max_model_len=16, max_num_requests=4)
    outs = llm.encode([{"prompt_token_ids": list(range(3, 60))}])
    assert len(outs) == 1 and outs[0].finished
    assert outs[0].embedding is None
    # mixed batch: good one gets a vector, long one gets None
    outs = llm.encode([{"prompt_token_ids": [5, 6, 7]},
                       {"prompt_token_ids": list(range(3, 60))}])
    by_id = {o.request_id: o for o in outs}
    assert len(outs) == 2
    embs = [o.embedding for o in outs]
    assert sum(e is None for e in embs) == 1
