"""StatsLogger / profiler-hook wiring (core/metrics.py)."""

import logging

from light_vllm_tpu.core.metrics import JaxProfilerHook, StatsLogger


class FakeGroup:
    def __init__(self, chunk):
        self.token_chunk_size = chunk


class FakeSchedulerOutput:
    def __init__(self, groups, n_prefill, batched, multi_step=1,
                 preempted=0):
        self.scheduled_seq_groups = groups
        self.num_prefill_groups = n_prefill
        self.num_batched_tokens = batched
        self.multi_step = multi_step
        self.preempted = preempted


class FakeScheduler:
    running = [1, 2]
    waiting = [3]
    swapped = []


def test_stats_logger_counts_and_flushes(monkeypatch):
    import light_vllm_tpu.core.metrics as m
    lines = []
    monkeypatch.setattr(m.logger, "info",
                        lambda fmt, *a: lines.append(fmt % a))
    s = StatsLogger(interval=0.0001)
    out = FakeSchedulerOutput(
        groups=[FakeGroup(64), FakeGroup(32), FakeGroup(1), FakeGroup(1)],
        n_prefill=2, batched=98, multi_step=4)
    import time
    time.sleep(0.001)
    s.on_step(out, [], FakeScheduler())
    assert lines and "prompt" in lines[0] and "running 2" in lines[0]
    # after flush counters reset
    assert s.prompt_tokens == 0 and s.gen_tokens == 0


def test_stats_logger_token_split():
    s = StatsLogger(interval=1e9)  # never flushes
    out = FakeSchedulerOutput(
        groups=[FakeGroup(64), FakeGroup(1), FakeGroup(1)],
        n_prefill=1, batched=66, multi_step=8, preempted=2)
    s.on_step(out, [], None)
    assert s.prompt_tokens == 64
    assert s.gen_tokens == 2 * 8  # two decode seqs x 8 device steps
    assert s.preempted == 2


def test_stats_logger_prefill_only_output():
    class PrefillOut:
        num_batched_tokens = 100
        scheduled_seq_groups = []
    s = StatsLogger(interval=1e9)
    s.on_step(PrefillOut(), [], None)
    assert s.prompt_tokens == 100 and s.gen_tokens == 0


def test_profiler_hook_window(tmp_path, monkeypatch):
    calls = []
    import jax.profiler as jp
    monkeypatch.setattr(jp, "start_trace", lambda d: calls.append(("start", d)))
    monkeypatch.setattr(jp, "stop_trace", lambda: calls.append(("stop",)))
    h = JaxProfilerHook(str(tmp_path), delay_steps=2, num_steps=3)
    for _ in range(10):
        h.on_step()
    assert calls == [("start", str(tmp_path)), ("stop",)]
    h.close()
    assert calls == [("start", str(tmp_path)), ("stop",)]
