"""Engine-level metrics + profiling hooks.

The reference deliberately amputated vLLM's metrics stack (reference:
README.md:17) and kept only per-request RequestMetrics timestamps plus a
step-timing stamp on ExecuteOutput (reference: core/executor.py:31-46).
SURVEY.md §5 directs the TPU build to keep that minimalism but emit
step-level tokens/s counters and expose jax.profiler traces — this module
is that: a StatsLogger aggregating throughput / queue depth / KV usage on a
wall-clock interval, and a JaxProfilerHook that captures an N-step trace
window driven by env vars (the TPU analog of the reference's
torch.profiler scripts, benchmarks/profiler/profiling_decoding.py).
"""

import sys
import time
from typing import List, Optional

from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


class StatsLogger:
    """Rolling step-level counters, flushed as one INFO line per interval:
    prompt/generation tok/s, queue depths, KV-cache usage, preemptions."""

    def __init__(self, interval: float = 10.0) -> None:
        self.interval = interval
        self._reset()
        self.last_flush = time.perf_counter()

    def _reset(self) -> None:
        self.prompt_tokens = 0
        self.gen_tokens = 0
        self.preempted = 0
        self.steps = 0
        self.real_tokens = 0
        self.padded_tokens = 0

    def on_step(self, scheduler_output, request_outputs: List,
                scheduler=None) -> None:
        if self.interval <= 0:
            return
        self.steps += 1
        n_prefill = getattr(scheduler_output, "num_prefill_groups", None)
        batched = getattr(scheduler_output, "num_batched_tokens", 0)
        if n_prefill is None:
            # Prefill-only workflows: every scheduled token is prompt.
            self.prompt_tokens += batched
        else:
            groups = scheduler_output.scheduled_seq_groups
            prefill_toks = sum(
                getattr(g, "token_chunk_size", 1)
                for g in groups[:n_prefill])
            multi_step = getattr(scheduler_output, "multi_step", 1)
            self.prompt_tokens += prefill_toks
            self.gen_tokens += (batched - prefill_toks) * multi_step
        self.preempted += getattr(scheduler_output, "preempted", 0)
        padded = getattr(scheduler_output, "padded_tokens", 0)
        if padded:
            self.real_tokens += batched
            self.padded_tokens += padded

        now = time.perf_counter()
        dt = now - self.last_flush
        if dt < self.interval:
            return
        parts = [f"prompt {self.prompt_tokens / dt:.1f} tok/s",
                 f"gen {self.gen_tokens / dt:.1f} tok/s",
                 f"{self.steps / dt:.1f} steps/s"]
        if scheduler is not None:
            running = len(getattr(scheduler, "running", ()))
            waiting = len(getattr(scheduler, "waiting", ()))
            swapped = len(getattr(scheduler, "swapped", ()))
            parts.append(f"running {running} waiting {waiting} "
                         f"swapped {swapped}")
            bm = getattr(scheduler, "block_manager", None)
            if bm is not None and hasattr(bm, "get_num_free_device_blocks"):
                total = bm.device_allocator.num_blocks
                free = bm.get_num_free_device_blocks()
                if total:
                    parts.append(
                        f"KV usage {100.0 * (total - free) / total:.1f}%")
        if self.padded_tokens:
            # Bucket-padding occupancy: real scheduled tokens / padded
            # executable token region (100% = no padding waste).
            parts.append(
                f"occupancy {100.0 * self.real_tokens / self.padded_tokens:.0f}%")
        if self.preempted:
            parts.append(f"preempted {self.preempted}")
        logger.info("engine: %s", ", ".join(parts))
        self._reset()
        self.last_flush = now


class JaxProfilerHook:
    """Capture a jax.profiler trace over a window of engine steps.

    Env-driven (see envs.py): LVT_PROFILE_DIR enables; the trace starts
    after LVT_PROFILE_DELAY_STEPS warmup steps and stops
    LVT_PROFILE_NUM_STEPS later. View with TensorBoard / xprof."""

    def __init__(self, trace_dir: str, delay_steps: int = 10,
                 num_steps: int = 20) -> None:
        self.trace_dir = trace_dir
        self.start_at = delay_steps
        self.stop_at = delay_steps + num_steps
        self.step = 0
        self.active = False

    def on_step(self) -> None:
        self.step += 1
        if self.step == self.start_at and not self.active:
            import jax

            logger.info("starting jax.profiler trace -> %s", self.trace_dir)
            jax.profiler.start_trace(self.trace_dir)
            self.active = True
        elif self.step == self.stop_at and self.active:
            import jax

            jax.profiler.stop_trace()
            self.active = False
            logger.info("jax.profiler trace written to %s", self.trace_dir)

    def close(self) -> None:
        if self.active:
            import jax

            jax.profiler.stop_trace()
            self.active = False


def build_hooks_from_env():
    """(stats_logger, profiler_hook) per env config; either may be None."""
    from light_vllm_tpu import envs

    stats = None
    interval = envs.LVT_LOG_STATS_INTERVAL
    if interval > 0:
        stats = StatsLogger(interval)
    prof = None
    if envs.LVT_PROFILE_DIR:
        prof = JaxProfilerHook(envs.LVT_PROFILE_DIR,
                               envs.LVT_PROFILE_DELAY_STEPS,
                               envs.LVT_PROFILE_NUM_STEPS)
    return stats, prof


def enable_trace_function_call(log_path: str,
                               max_depth: Optional[int] = None) -> None:
    """sys.settrace-based call logging for the current thread (reference:
    utils.py:875 enable_trace_function_call_for_thread) — debugging aid for
    hangs in engine/executor threads, enabled by LVT_TRACE_FUNCTION."""
    f = open(log_path, "a", buffering=1)
    depth = 0

    def tracer(frame, event, arg):
        nonlocal depth
        if event == "call":
            depth += 1
            if max_depth is None or depth <= max_depth:
                code = frame.f_code
                f.write(f"{time.time():.6f} {'  ' * depth}-> "
                        f"{code.co_filename}:{code.co_firstlineno} "
                        f"{code.co_name}\n")
        elif event == "return":
            depth = max(0, depth - 1)
        return tracer

    sys.settrace(tracer)
