"""Engine-replica data parallelism for decoding workloads.

TPU-native counterpart of the reference's per-device DP executor
(reference: light_vllm/prefill_only/executor/
gpu_data_parallelism_executor.py:17-81 — N workers, one per device,
fed from a shared queue). Decoding is stateful (each request's KV pages
live where its prefill ran), so DP for decoding is REPLICA parallelism:
N complete engines, each pinned to a disjoint tp-sized device group via a
private 1..tp-device mesh, with requests sticky-routed at admission.

Within a replica, tensor parallelism works as usual (tp axis of its
mesh); across replicas there is NO communication — scaling is linear by
construction, which is exactly the DP contract (the scheduler never
needs to migrate KV between chips, matching the reference's design where
DP workers never share state).

Engines step in parallel from Python threads: the GIL is released while
a step executable runs on its device, so replica steps overlap on real
hardware.
"""

import threading
from typing import Any, List, Optional, Sequence, Union

import jax

from light_vllm_tpu.core.schema.engine_io import Params, PromptType
from light_vllm_tpu.entrypoints.llm import LLM
from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


class DataParallelLLM:
    """N independent LLM engines behind one generate() queue.

    data_parallel_size engines are built, engine i pinned to devices
    [i*tp, (i+1)*tp). Requests are round-robin sharded; outputs return in
    input order.
    """

    def __init__(self, data_parallel_size: int = 2, **kwargs) -> None:
        tp = kwargs.get("tensor_parallel_size", 1)
        devices = kwargs.pop("devices", None) or jax.devices()
        need = data_parallel_size * tp
        if need > len(devices):
            raise ValueError(
                f"dp={data_parallel_size} x tp={tp} needs {need} devices; "
                f"{len(devices)} available")
        self.data_parallel_size = data_parallel_size
        self.replicas: List[LLM] = []
        for i in range(data_parallel_size):
            group = list(devices[i * tp:(i + 1) * tp])
            logger.info("DP replica %d on devices %s", i,
                        [getattr(d, "id", d) for d in group])
            self.replicas.append(LLM(devices=group, **kwargs))

    def generate(self, prompts: Union[PromptType, Sequence[PromptType]],
                 sampling_params: Optional[Union[Params, Sequence[Params]]]
                 = None) -> List[Any]:
        if isinstance(prompts, (str, dict)):
            prompts = [prompts]
        prompts = list(prompts)
        n = len(prompts)
        params_list = (list(sampling_params)
                       if isinstance(sampling_params, (list, tuple))
                       else [sampling_params] * n)
        shards: List[List[int]] = [[] for _ in self.replicas]
        for idx in range(n):
            shards[idx % self.data_parallel_size].append(idx)

        results: List[Any] = [None] * n
        errors: List[BaseException] = []

        def run(r: int) -> None:
            idxs = shards[r]
            if not idxs:
                return
            try:
                outs = self.replicas[r].generate(
                    [prompts[i] for i in idxs],
                    [params_list[i] for i in idxs])
                for i, out in zip(idxs, outs):
                    results[i] = out
            except BaseException as e:  # ferried to the caller
                errors.append(e)

        threads = [threading.Thread(target=run, args=(r,), daemon=True)
                   for r in range(self.data_parallel_size)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        return results
