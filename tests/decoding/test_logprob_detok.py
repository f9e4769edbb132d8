"""Logprob.decoded_token + spaces_between_special_tokens parity
(reference: core/processor/tokenizer.py:45-205 decode_prompt_logprobs_inplace
/ decode_sequence_inplace filling Logprob.decoded_token, and the
spaces_between_special_tokens threading at tokenizer.py:152-155)."""

import pytest

from tests.decoding.test_generate_e2e import make_llm, tiny_qwen2_config


def make_word_tokenizer(vocab_size=256):
    """Tiny in-process whitespace WordLevel tokenizer sized to the test
    model's vocab (no network; ids decode to 'w<i>')."""
    from tokenizers import Tokenizer as TkTokenizer
    from tokenizers import models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {f"w{i}": i for i in range(vocab_size - 2)}
    vocab["<unk>"] = vocab_size - 2
    vocab["<sp>"] = vocab_size - 1
    tk = TkTokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    return PreTrainedTokenizerFast(tokenizer_object=tk, unk_token="<unk>",
                                   additional_special_tokens=["<sp>"])


@pytest.fixture(scope="module")
def tiny_qwen2():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(**{k: v for k, v in tiny_qwen2_config().items()
                         if k != "architectures"})
    torch.manual_seed(0)
    return cfg, Qwen2ForCausalLM(cfg).eval()


def test_logprob_decoded_token_matches_hf(tiny_qwen2):
    from light_vllm_tpu import SamplingParams

    _, hf_model = tiny_qwen2
    hf_tok = make_word_tokenizer()
    llm = make_llm(hf_model, tokenizer_override=hf_tok)
    ids = [5, 17, 33, 47]
    outs = llm.generate([{"prompt_token_ids": ids}],
                        SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True, logprobs=3,
                                       prompt_logprobs=2))
    comp = outs[0].outputs[0]

    # sampled-token deltas reassemble the output text exactly
    chosen_texts = [comp.logprobs[i][comp.token_ids[i]].decoded_token
                    for i in range(len(comp.token_ids))]
    assert all(t is not None for t in chosen_texts)
    assert "".join(chosen_texts) == comp.text

    # every candidate's decoded_token matches the HF decode delta at the
    # last position: decode(ctx + cand) == decode(ctx) + decoded_token
    all_ids = ids + comp.token_ids
    ctx = all_ids[:-1]
    base = hf_tok.decode(ctx)
    for tid, lp in comp.logprobs[-1].items():
        assert hf_tok.decode(ctx + [tid]) == base + lp.decoded_token

    # rank: 1-based among the returned top-k, best-first
    ranked = [(lp.rank, float(lp)) for lp in comp.logprobs[0].values()
              if lp.rank is not None]
    ranked.sort()
    assert [r for r, _ in ranked] == list(range(1, len(ranked) + 1))
    assert all(ranked[i][1] >= ranked[i + 1][1]
               for i in range(len(ranked) - 1))

    # prompt logprobs carry candidate text too
    assert outs[0].prompt_logprobs[0] is None
    for d in outs[0].prompt_logprobs[1:]:
        for tid, lp in d.items():
            assert lp.decoded_token == hf_tok.decode([tid])


def test_spaces_between_special_tokens(tiny_qwen2):
    """skip_special_tokens=False keeps special tokens in the text;
    spaces_between_special_tokens picks ' ' vs '' joining (reference:
    tokenizer.py _convert_tokens_to_string_with_added_encoders)."""
    from light_vllm_tpu.core.processor.tokenizer import Tokenizer

    tok = Tokenizer(tokenizer=make_word_tokenizer())
    sp_id = 255  # "<sp>" special token
    ids = [5, sp_id, 7]

    def detok(spaces):
        text, prev, po, ro = "", None, 0, 0
        for i in range(1, len(ids) + 1):
            prev_t, delta, po, ro = tok.detokenize_incrementally(
                ids[:i], prev, po, ro, skip_special_tokens=False,
                spaces_between_special_tokens=spaces)
            prev = prev_t if prev is None else prev + prev_t
            text += delta
        return text

    # the first call primes the window over ids[0] (the "prompt") and
    # emits no delta; the special-token joining shows in the deltas after
    assert detok(True) == " <sp> w7"
    assert detok(False) == "<sp>w7"
