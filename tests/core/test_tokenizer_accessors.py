"""LLM.get_tokenizer / set_tokenizer API parity (reference:
entrypoints/llm.py:61-77). set_tokenizer swaps the HF tokenizer in place
so components already holding the wrapper (output processor) detokenize
with the new vocabulary, and cached special-token attributes recompute."""

from tests.decoding.test_generate_e2e import make_llm, tiny_qwen2_config
from tests.decoding.test_logprob_detok import make_word_tokenizer


def test_get_set_tokenizer_roundtrip():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(**{k: v for k, v in tiny_qwen2_config().items()
                         if k != "architectures"})
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(cfg).eval()

    tok_a = make_word_tokenizer(cfg.vocab_size)
    llm = make_llm(hf, tokenizer_override=tok_a)
    assert llm.get_tokenizer() is tok_a

    from light_vllm_tpu import SamplingParams

    params = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True)
    out_a = llm.generate([{"prompt_token_ids": [5, 6, 7]}], params)[0]
    ids = list(out_a.outputs[0].token_ids)
    assert out_a.outputs[0].text.split() == [f"w{i}" for i in ids]

    # Swap in a tokenizer whose vocabulary decodes differently; the
    # output processor (which captured the wrapper at engine build)
    # must pick it up.
    from transformers import PreTrainedTokenizerFast
    from tokenizers import Tokenizer as TkTokenizer
    from tokenizers import models, pre_tokenizers

    vocab = {f"x{i}": i for i in range(cfg.vocab_size - 1)}
    vocab["<unk>"] = cfg.vocab_size - 1
    tk = TkTokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    tok_b = PreTrainedTokenizerFast(tokenizer_object=tk, unk_token="<unk>")

    llm.set_tokenizer(tok_b)
    assert llm.get_tokenizer() is tok_b
    # Wrapper caches recomputed from the new tokenizer.
    assert llm.llm_engine.tokenizer.vocab_size == len(tok_b)

    out_b = llm.generate([{"prompt_token_ids": [5, 6, 7]}], params)[0]
    ids_b = list(out_b.outputs[0].token_ids)
    assert ids_b == ids  # same model, same greedy tokens
    assert out_b.outputs[0].text.split() == [f"x{i}" for i in ids_b]


def test_set_tokenizer_unwraps_wrapped_tokenizer():
    """Passing an already-wrapped Tokenizer must not nest wrappers
    (the wrapper is not callable; nesting breaks reranker pair
    encoding)."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from light_vllm_tpu.core.processor.tokenizer import Tokenizer

    cfg = Qwen2Config(**{k: v for k, v in tiny_qwen2_config().items()
                         if k != "architectures"})
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(cfg).eval()
    tok = make_word_tokenizer(cfg.vocab_size)
    llm = make_llm(hf, tokenizer_override=tok)

    wrapped = Tokenizer(tokenizer=make_word_tokenizer(cfg.vocab_size))
    llm.set_tokenizer(wrapped)
    # Unwrapped: get_tokenizer returns the raw HF tokenizer, not the
    # wrapper, and the engine wrapper holds no nested Tokenizer.
    assert llm.get_tokenizer() is wrapped.tokenizer
    assert not isinstance(llm.llm_engine.tokenizer.tokenizer, Tokenizer)
