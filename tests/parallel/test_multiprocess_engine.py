"""2-process ENGINE e2e (VERDICT r3 missing #2 / SURVEY §7 stage 9): the
real LLMEngine constructed and stepped under jax.process_count() == 2,
dp across the process (DCN) boundary, tp inside each process — token
parity against the identical single-process 4-device run. Every process
runs the same host program; step outputs are all-gathered in-step so the
per-process output processors stay consistent."""

import json
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_single_process_reference() -> dict:
    """The same workload on ONE process with 4 virtual devices and the
    same tp=2 x dp=2 mesh — numerics and partitioning identical, so
    greedy tokens must match bit-for-bit."""
    code = (
        "import tests.parallel.engine_worker as w, json;"
        "print('ENGINE TOKENS ' + json.dumps(w.build_and_generate()))")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd()] + env.get("PYTHONPATH", "").split(os.pathsep))
    out = subprocess.run(
        [sys.executable, "-c",
         "import torch, jax;"
         "jax.config.update('jax_platforms', 'cpu');"
         "import os; os.environ['LVT_PLATFORM']='cpu';"
         "os.environ['LVT_ATTENTION_BACKEND']='reference';" + code],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-4000:]
    for line in out.stdout.splitlines():
        if line.startswith("ENGINE TOKENS "):
            return json.loads(line[len("ENGINE TOKENS "):])
    raise AssertionError("no tokens line:\n" + out.stdout[-2000:])


def test_two_process_engine_token_parity():
    worker = os.path.join(os.path.dirname(__file__), "engine_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd()] + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    per_proc = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-6000:]}"
        assert f"ENGINE worker {pid} OK" in out, out[-2000:]
        for line in out.splitlines():
            if line.startswith("ENGINE TOKENS "):
                per_proc[pid] = json.loads(line[len("ENGINE TOKENS "):])
    # both processes emitted complete, identical outputs
    assert per_proc[0] == per_proc[1]
    assert len(per_proc[0]) == 6
    assert all(len(v) == 6 for v in per_proc[0].values())

    ref = _run_single_process_reference()
    assert per_proc[0] == ref
