"""User-facing LLM class (reference: light_vllm/entrypoints/llm.py:18-133).

    llm = LLM(model="Qwen/Qwen2-0.5B-Instruct")
    outs = llm.generate(["hello"], SamplingParams(max_tokens=32))

    enc = LLM(model="BAAI/bge-m3")
    vecs = enc.encode(["a sentence"])

    rr = LLM(model="BAAI/bge-reranker-v2-m3")
    scores = rr.reranker([("query", "passage")])
"""

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

from tqdm.auto import tqdm

from light_vllm_tpu.core.llm_engine import LLMEngine
from light_vllm_tpu.core.schema.engine_io import Params, PromptType
from light_vllm_tpu.utils import Counter


class LLM:

    def __init__(self, model: str = "", tokenizer: Optional[str] = None,
                 tokenizer_override: Any = None, **kwargs) -> None:
        engine_args = dict(model=model, tokenizer=tokenizer, **kwargs)
        self.llm_engine = LLMEngine.from_engine_args(
            engine_args, tokenizer_override=tokenizer_override)
        self.request_counter = Counter()

    def shutdown(self) -> None:
        """Stop engine threads and free all device memory (weights + KV).
        Call before constructing another LLM in the same process."""
        self.llm_engine.shutdown()

    # --- tokenizer access (reference: entrypoints/llm.py:61-77) ------------
    def get_tokenizer(self) -> Any:
        """The underlying HF tokenizer."""
        return self.llm_engine.tokenizer.tokenizer

    def set_tokenizer(self, tokenizer: Any) -> None:
        """Swap the HF tokenizer (e.g. one with added special tokens).
        The wrapper is re-initialized in place so every component holding
        a reference (output processor, request processor) sees the new
        tokenizer and its recomputed cached special-token attributes.

        Must be called between generate()/encode() calls: in-flight
        sequences carry incremental-detokenizer state (prev tokens,
        offsets) computed under the old vocabulary, and the in-place
        swap retroactively changes eos/special-id caches they rely on."""
        from light_vllm_tpu.core.processor.tokenizer import Tokenizer

        if isinstance(tokenizer, Tokenizer):
            # Accept an already-wrapped tokenizer (reference special-cases
            # its Cached* classes the same way) — nesting would break
            # callers that invoke the raw HF tokenizer directly, e.g. the
            # reranker's pair encoding.
            tokenizer = tokenizer.tokenizer
        if self.llm_engine.has_unfinished_requests():
            raise RuntimeError(
                "set_tokenizer() with unfinished requests in the engine: "
                "in-flight sequences would detokenize under a stale "
                "vocabulary; drain or abort them first")
        self.llm_engine.tokenizer.__init__(tokenizer=tokenizer)

    # --- generation --------------------------------------------------------
    def generate(self, prompts: Union[PromptType, Sequence[PromptType]],
                 sampling_params: Optional[Union[Params, Sequence[Params]]]
                 = None, use_tqdm: bool = False) -> List:
        from light_vllm_tpu.decoding.sampling_params import SamplingParams

        if sampling_params is None:
            sampling_params = SamplingParams()
        return self._run(prompts, sampling_params, use_tqdm)

    # --- embedding ---------------------------------------------------------
    def encode(self, prompts: Union[PromptType, Sequence[PromptType]],
               params: Optional[Params] = None,
               use_tqdm: bool = False) -> List:
        return self._run(prompts, params, use_tqdm)

    # --- reranking ---------------------------------------------------------
    def reranker(self, pairs: Sequence[Tuple[str, str]],
                 params: Optional[Params] = None,
                 use_tqdm: bool = False) -> List:
        return self._run(list(pairs), params, use_tqdm)

    # --- shared driver -----------------------------------------------------
    def _run(self, prompts, params, use_tqdm: bool) -> List:
        if isinstance(prompts, (str, dict, tuple)):
            prompts = [prompts]
        n = len(prompts)
        params_list = params if isinstance(params, (list, tuple)) \
            else [params] * n
        if len(params_list) != n:
            raise ValueError("params list length mismatch")
        for prompt, p in zip(prompts, params_list):
            request_id = str(next(self.request_counter))
            self.llm_engine.add_request(request_id, prompt, p)
        return self._run_engine(use_tqdm)

    def _run_engine(self, use_tqdm: bool) -> List:
        pbar = tqdm(total=self.llm_engine.get_num_unfinished_requests(),
                    desc="Processed requests") if use_tqdm else None
        outputs = []
        while self.llm_engine.has_unfinished_requests():
            step_outputs = self.llm_engine.step()
            for out in step_outputs:
                if out.finished:
                    outputs.append(out)
                    if pbar:
                        pbar.update(1)
        if pbar:
            pbar.close()
        outputs.sort(key=lambda o: int(o.request_id))
        return outputs
