"""Centralized, lazily-read environment flags.

Counterpart of the reference's env registry (reference: light_vllm/envs.py:90+),
trimmed to the knobs that are meaningful on TPU.
"""

import os
from typing import Any, Callable, Dict

environment_variables: Dict[str, Callable[[], Any]] = {
    # Logging
    "LVT_LOGGING_LEVEL": lambda: os.environ.get("LVT_LOGGING_LEVEL", "INFO"),
    # Attention backend selection ("pallas" | "reference"); auto when unset.
    "LVT_ATTENTION_BACKEND": lambda: os.environ.get("LVT_ATTENTION_BACKEND", None),
    # Force platform ("tpu" | "cpu"); auto-detected when unset.
    "LVT_PLATFORM": lambda: os.environ.get("LVT_PLATFORM", None),
    # Directory for weight download cache.
    "LVT_CACHE_ROOT": lambda: os.path.expanduser(
        os.environ.get("LVT_CACHE_ROOT", "~/.cache/light_vllm_tpu")),
    # Artificial preemption fault-injection for scheduler tests
    # (reference: light_vllm/decoding/scheduler.py:22-26).
    "LVT_TEST_ENABLE_ARTIFICIAL_PREEMPT": lambda: bool(
        int(os.environ.get("LVT_TEST_ENABLE_ARTIFICIAL_PREEMPT", "0"))),
    # Trace every python function call in engine threads (debugging aid;
    # reference: light_vllm/envs.py VLLM_TRACE_FUNCTION).
    "LVT_TRACE_FUNCTION": lambda: bool(
        int(os.environ.get("LVT_TRACE_FUNCTION", "0"))),
    # Token bucket padding policy: comma separated bucket sizes.
    "LVT_TOKEN_BUCKETS": lambda: os.environ.get("LVT_TOKEN_BUCKETS", None),
    # Static-shape mode: pad every decoding step to a FIXED (T, S) per step
    # kind (pure prefill / mixed / pure decode), collapsing the executable
    # set to a handful of shapes so ramp-up and async scheduling never hit
    # mid-run XLA compiles. "auto" = on for TPU, off for CPU tests.
    "LVT_STATIC_SHAPES": lambda: os.environ.get("LVT_STATIC_SHAPES", "auto"),
    # AOT-precompile the static executable set at engine init, in parallel
    # threads (XLA compilation releases the GIL; with a remote compile
    # service the wall time is ~the slowest single compile instead of the
    # sum). "auto" = on when static shapes are on; "greedy" = only the
    # greedy-sampling variants; "0" = off.
    "LVT_PRECOMPILE": lambda: os.environ.get("LVT_PRECOMPILE", "auto"),
    # Compile the (slowest, ~K model traces each) multi-step executables
    # on background threads at init; their windows serve through the
    # single-step path until ready. "0" = block init on them.
    "LVT_PRECOMPILE_BG": lambda: os.environ.get("LVT_PRECOMPILE_BG", "1"),
    # KV sizing: measure the activation peak from the compiled largest
    # prefill executable's XLA memory analysis instead of the analytic
    # reserve formula ("0" disables, "1" forces, "auto" = on except over
    # a remote-compile relay, whose d2h of trace-captured constants
    # during lowering wedges intermittently; the reference's analog is
    # the dummy-batch profile run, gpu_worker.py:95-144).
    "LVT_MEASURED_SIZING": lambda: os.environ.get(
        "LVT_MEASURED_SIZING", "auto"),
    # MoE expert-compute path: "grouped" (Pallas gmm) | "dense"
    # (masked-dense) | unset = auto by platform and batch size.
    "LVT_MOE_BACKEND": lambda: os.environ.get("LVT_MOE_BACKEND", None),
    # Scan decoder layers with lax.scan (stacked [L, ...] params + KV):
    # one layer body per executable instead of num_layers unrolled copies,
    # cutting compile time ~num_layers-fold. Models opt in via
    # supports_scan; 0 forces the unrolled path everywhere.
    "LVT_SCAN_LAYERS": lambda: bool(
        int(os.environ.get("LVT_SCAN_LAYERS", "1"))),
    # Partial unroll factor for the layer scan: N layer bodies per loop
    # iteration. Trades a little compile time for less while-loop
    # overhead (dispatch + lost inter-layer overlap).
    "LVT_SCAN_UNROLL": lambda: int(os.environ.get("LVT_SCAN_UNROLL", "1")),
    # Under the layer scan, feed linears the whole weight stack + layer
    # index (Pallas stacked matmul) instead of an XLA dynamic-slice, which
    # HLO remat re-executes (~5x weight-read roofline per decode step).
    # "auto" = on TPU (off under tp>1 meshes — pallas is not GSPMD-
    # partitionable); "1"/"0" force.
    "LVT_INDEXED_PARAMS": lambda: os.environ.get("LVT_INDEXED_PARAMS",
                                                 "auto"),
    # Manual-SPMD tensor parallelism: run the whole decoding step inside
    # one shard_map over the mesh (parallel/manual.py), keeping the Pallas
    # stacked matmuls enabled under tp>1 (GSPMD can't partition
    # pallas_call; the fallback XLA weight-stack slicing measured ~2x
    # step time). "1" (default) = on when tp>1 and the model supports it;
    # "0" = force the GSPMD path.
    "LVT_MANUAL_TP": lambda: os.environ.get("LVT_MANUAL_TP", "1"),
    # Deferred-output decode chaining (async mode): pure-decode multi-step
    # windows whose outputs no host decision depends on are pythonized
    # lazily; the worker splices the previous window's device-side tokens
    # into the next blob, so decode never waits on a d2h round trip.
    # Default off: on the short-generation serving bench (16 out tokens,
    # 2 windows) the dispatch-time blob splice costs more than the one
    # readback it saves (27.0k vs 26.0k tok/s measured); enable for
    # long-generation decode-bound workloads.
    "LVT_DEFER_OUTPUTS": lambda: bool(
        int(os.environ.get("LVT_DEFER_OUTPUTS", "0"))),
    # Max consecutive deferred windows before a drain (bounds streaming
    # latency; old rings' readbacks started at dispatch, so periodic
    # drains are nearly free).
    "LVT_DEFER_MAX_WINDOWS": lambda: int(
        os.environ.get("LVT_DEFER_MAX_WINDOWS", "8")),
    # Step-level stats logging interval in seconds (0 disables).
    "LVT_LOG_STATS_INTERVAL": lambda: float(
        os.environ.get("LVT_LOG_STATS_INTERVAL", "10")),
    # jax.profiler trace capture: output dir enables; trace spans
    # [DELAY, DELAY+NUM) engine steps.
    "LVT_PROFILE_DIR": lambda: os.environ.get("LVT_PROFILE_DIR", None),
    "LVT_PROFILE_DELAY_STEPS": lambda: int(
        os.environ.get("LVT_PROFILE_DELAY_STEPS", "10")),
    "LVT_PROFILE_NUM_STEPS": lambda: int(
        os.environ.get("LVT_PROFILE_NUM_STEPS", "20")),
}


def __getattr__(name: str):
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return list(environment_variables.keys())
