"""Measured KV sizing: the worker compiles the largest prefill executable
against a tiny abstract KV cache and reads XLA's buffer-assignment memory
analysis, the exact analog of the reference's dummy-batch profile run
(reference: light_vllm/decoding/worker/gpu_worker.py:95-144
determine_num_available_blocks)."""


from tests.decoding.test_generate_e2e import tiny_qwen2_config


def _build_worker(monkeypatch, measured="1"):
    from light_vllm_tpu import LLM

    monkeypatch.setenv("LVT_STATIC_SHAPES", "1")
    monkeypatch.setenv("LVT_PRECOMPILE", "0")
    monkeypatch.setenv("LVT_MEASURED_SIZING", measured)
    llm = LLM(hf_config=tiny_qwen2_config(), load_format="dummy",
              dtype="float32", max_model_len=128, max_num_seqs=4,
              block_size=8, max_num_batched_tokens=256)
    worker = llm.llm_engine.executor.worker
    llm.llm_engine.executor.shutdown_execute_loop()
    return worker


def test_measured_activation_bytes_on_cpu(monkeypatch):
    """memory_analysis works on the CPU backend too: the measurement
    helper must return a plausible positive byte count for the largest
    prefill bucket (or None only if the backend lacks the API)."""
    worker = _build_worker(monkeypatch)
    act = worker._measured_activation_bytes()
    assert act is not None and act > 0
    # tiny model, T=256 bucket: the arena must be well under a GiB
    assert act < 2**30


def test_measured_sizing_disabled_by_env(monkeypatch):
    worker = _build_worker(monkeypatch, measured="0")
    assert worker._measured_activation_bytes() is None
