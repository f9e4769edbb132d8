"""Worker script for the 2-process DCN-path test (launched by
test_multiprocess_dcn.py). Each process contributes 2 CPU devices; the
hybrid mesh lays dp across processes (the DCN axis) and tp inside one
process (the ICI axis), and both a GSPMD pjit reduction and a
manual-collectives shard_map (the engine's manual-TP pattern) must agree
with the single-process result."""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import torch  # noqa: F401  (torch-before-jax: OpenMP runtime clash)
import jax

jax.config.update("jax_platforms", "cpu")
os.environ["LVT_PLATFORM"] = "cpu"

import numpy as np  # noqa: E402


def main() -> None:
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    from light_vllm_tpu.parallel.mesh import (build_mesh,
                                              initialize_distributed)

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    mesh = build_mesh(tensor_parallel_size=2, data_parallel_size=2)
    assert mesh.shape == {"dp": 2, "tp": 2}, mesh.shape
    # dp must cross processes (DCN), tp must stay inside one
    arr = np.asarray(mesh.devices)
    for row in range(2):
        procs = {d.process_index for d in arr[row]}
        assert len(procs) == 1, f"tp row crosses processes: {procs}"
    col_procs = {arr[0, 0].process_index, arr[1, 0].process_index}
    assert len(col_procs) == 2, "dp axis does not cross processes"

    from jax.sharding import NamedSharding, PartitionSpec as P

    # GSPMD: global [4, 8] array sharded (dp, tp); psum-style reduction.
    x = np.arange(32, dtype=np.float32).reshape(4, 8)
    xs = jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, P("dp", "tp")),
        lambda idx: x[idx])
    total = jax.jit(lambda a: a.sum(),
                    out_shardings=NamedSharding(mesh, P()))(xs)
    got = float(np.asarray(jax.device_get(total)))
    assert got == float(x.sum()), (got, x.sum())

    # Manual collectives: the engine's whole-step shard_map pattern —
    # per-shard partial matmul + psum over "tp", dp shards independent.
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    a_s = jax.make_array_from_callback(
        a.shape, NamedSharding(mesh, P("dp", "tp")), lambda i: a[i])
    w_s = jax.make_array_from_callback(
        w.shape, NamedSharding(mesh, P("tp", None)), lambda i: w[i])

    def body(a_l, w_l):
        return jax.lax.psum(a_l @ w_l, "tp")

    y = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("dp", "tp"), P("tp", None)),
        out_specs=P("dp", None), check_vma=False))(a_s, w_s)
    # y spans both processes (dp is the DCN axis): check the local shards
    ref = a @ w
    checked = 0
    for shard in y.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_allclose(np.asarray(shard.data), ref[rows],
                                   rtol=1e-5, atol=1e-5)
        checked += 1
    assert checked >= 1
    print(f"DCN worker {pid} OK")


if __name__ == "__main__":
    main()
