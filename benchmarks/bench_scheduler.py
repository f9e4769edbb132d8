"""Host-side scheduler throughput (VERDICT r4 #8 / SURVEY hard part #4).

Drives the REAL DecodingScheduler decode loop — schedule(), per-seq
token append (block-manager append_slots), free-finished — with N
running sequences and no model execution, reporting steps/s per
(prefix_caching, N) cell. The scheduler must sustain more steps/s than
the device serves (a 100-ms 8B multi-step window needs ~10/s; a 1.5B
step at ~5 ms with K=8 multi-step needs ~25/s).

This benchmark is also the measurement that KILLED the C++ host-runtime
allocator (r5): with both allocators live it measured, per cell
(python steps/s vs ctypes-C++ steps/s):

    256 seqs  apc off  231.0 vs 200.1  (0.87x)   apc on 147.9 vs 115.0
    512 seqs  apc off  112.8 vs  85.8  (0.76x)   apc on  60.8 vs  52.8
    1024 seqs apc off   43.6 vs  40.7  (0.93x)   apc on  30.3 vs  24.4
    2048 seqs apc off   23.7 vs  20.8  (0.88x)   apc on  24.7 vs  21.2

cProfile attribution: allocator ops are ~7% of scheduler step time
(append_slots 0.076 s of 1.05 s at 256 seqs); the per-op ctypes FFI
overhead exceeded the C++ win in every cell, and with a 7% Amdahl cap
no FFI batching could pay for the extra surface. The native runtime was
deleted; this script now tracks the Python scheduler's throughput.

    python benchmarks/bench_scheduler.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_scheduler(n_seqs, prefix_caching, prompt_len=256):
    from light_vllm_tpu.core.schema.engine_io import (TextOnlyInputs,
                                                      TextRequest)
    from light_vllm_tpu.decoding.config import (CacheConfig,
                                                DecodingSchedulerConfig)
    from light_vllm_tpu.decoding.processor import DecodingRequestProcessor
    from light_vllm_tpu.decoding.sampling_params import SamplingParams
    from light_vllm_tpu.decoding.scheduler import DecodingScheduler

    class FakeTokenizer:
        eos_token_id = -1

        def encode(self, text):
            return [1] * 8

    sc = DecodingSchedulerConfig(
        max_num_requests=n_seqs, max_model_len=4096,
        max_num_batched_tokens=max(2048, n_seqs),
        enable_chunked_prefill=False)
    cc = CacheConfig(block_size=16,
                     enable_prefix_caching=prefix_caching)
    # room for prompt + a long decode for every seq
    cc.num_device_blocks = n_seqs * ((prompt_len + 512) // 16 + 2) + 1
    cc.num_cpu_blocks = 64
    rp = DecodingRequestProcessor(FakeTokenizer(), cc.block_size)
    sched = DecodingScheduler(sc, cc, rp)
    for i in range(n_seqs):
        # 64 shared prefix tokens: with prefix_caching the lookup path
        # (content hashes, computed-block gate) runs on every allocation.
        ids = list(range(2, 66)) + [1000 + i + j for j in
                                    range(prompt_len - 64)]
        sched.add_request(TextRequest(
            request_id=f"r{i}", arrival_time=0.0,
            inputs=TextOnlyInputs(prompt_token_ids=ids),
            params=SamplingParams(max_tokens=4096, ignore_eos=True)))
    return sched


def run_cell(n_seqs, prefix_caching, n_steps=200):
    sched = build_scheduler(n_seqs, prefix_caching)

    def complete(out):
        for s in out.scheduled_seq_groups:
            g = s.seq_group
            g.busy = False
            for seq in g.get_seqs():
                seq.data.update_num_computed_tokens(
                    seq.get_len() - seq.data.get_num_computed_tokens())
        sched.free_finished_request(out)

    # admit everything (prefill waves)
    while sched.waiting:
        complete(sched.schedule())
    assert len(sched.running) == n_seqs, len(sched.running)

    # timed decode steps: every step schedules all N running seqs and
    # appends one token per seq (the steady-state hot loop)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = sched.schedule()
        assert len(out.scheduled_seq_groups) == n_seqs
        for s in out.scheduled_seq_groups:
            for seq in s.seq_group.get_seqs():
                seq.append_token_id(7)
        complete(out)
    dt = time.perf_counter() - t0
    return n_steps / dt


def main():
    print(f"{'N seqs':>7} {'apc':>5} {'steps/s':>9}")
    for n in (256, 512, 1024, 2048):
        for apc in (False, True):
            print(f"{n:7d} {str(apc):>5} {run_cell(n, apc):9.1f}")


if __name__ == "__main__":
    main()
