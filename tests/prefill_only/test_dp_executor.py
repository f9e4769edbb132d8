"""PrefillOnlyDataParallelExecutor e2e on a virtual CPU device fleet
(reference: light_vllm/prefill_only/executor/
gpu_data_parallelism_executor.py:17-81 — N workers, one shared queue).

Covers: outputs complete across ranks, parity with a single-device run,
per-rank device placement, and worker-exception surfacing.
"""

import numpy as np
import pytest

from tests.conftest import make_tiny_bert_config


def _reqs(rng, n, vocab=128, lo=5, hi=120):
    return [{"prompt_token_ids":
             rng.integers(lo, hi, size=int(rng.integers(4, 48))).tolist()}
            for _ in range(n)]


@pytest.fixture
def tiny_cfg():
    return make_tiny_bert_config(architectures=["XLMRobertaModel"])


def test_dp_executor_outputs_complete_and_match(tiny_cfg, rng):
    from light_vllm_tpu import LLM

    reqs = _reqs(rng, 24)

    llm1 = LLM(hf_config=tiny_cfg, load_format="dummy", max_model_len=64,
               max_num_requests=4, seed=0)
    ref = {o.request_id: np.asarray(o.embedding, np.float32)
           for o in llm1.encode(reqs)}
    llm1.shutdown()

    llm2 = LLM(hf_config=tiny_cfg, load_format="dummy", max_model_len=64,
               max_num_requests=4, seed=0, data_parallel_size=2)
    ex = llm2.llm_engine.executor
    from light_vllm_tpu.prefill_only.executor import \
        PrefillOnlyDataParallelExecutor
    assert isinstance(ex, PrefillOnlyDataParallelExecutor)
    assert len(ex.workers) == 2
    # Per-rank chip pinning: each worker's mesh holds exactly its device.
    import jax
    devs = jax.devices()
    for rank, w in enumerate(ex.workers):
        mesh_devs = list(w.mesh.devices.flat)
        assert mesh_devs == [devs[rank]]

    outs = llm2.encode(reqs)
    assert len(outs) == len(reqs)
    assert all(o.finished for o in outs)
    for o in outs:
        np.testing.assert_allclose(
            np.asarray(o.embedding, np.float32), ref[o.request_id],
            rtol=2e-2, atol=2e-2)
    llm2.shutdown()


def test_dp_executor_worker_exception_surfaces(tiny_cfg, rng):
    from light_vllm_tpu import LLM

    llm = LLM(hf_config=tiny_cfg, load_format="dummy", max_model_len=64,
              max_num_requests=4, seed=0, data_parallel_size=2)

    class Boom(RuntimeError):
        pass

    def boom(execute_input):
        raise Boom("injected dp worker failure")

    for w in llm.llm_engine.executor.workers:
        w.runner.execute_model = boom  # every rank fails fast

    with pytest.raises(Exception):
        llm.encode(_reqs(rng, 8))
    llm.shutdown()
