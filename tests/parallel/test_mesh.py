"""Mesh construction — single-host and simulated multi-slice DCN layout
(parallel/mesh.py)."""

import jax
import numpy as np
import pytest

import light_vllm_tpu.parallel.mesh as mesh_mod
from light_vllm_tpu.parallel.mesh import build_mesh


def test_single_host_mesh_shape():
    m = build_mesh(tensor_parallel_size=4, data_parallel_size=2)
    assert m.axis_names == ("dp", "tp")
    assert m.devices.shape == (2, 4)


def test_too_many_devices_raises():
    with pytest.raises(ValueError, match="available"):
        build_mesh(tensor_parallel_size=8, data_parallel_size=2)


def _fake_two_slices(monkeypatch):
    # Simulate two DCN-connected slices of 4 chips on the 8 CPU devices.
    monkeypatch.setattr(mesh_mod, "_slice_id", lambda d: d.id // 4)


def test_hybrid_mesh_dp_across_slices(monkeypatch):
    _fake_two_slices(monkeypatch)
    m = build_mesh(tensor_parallel_size=4, data_parallel_size=2)
    assert m.devices.shape == (2, 4)
    # Each TP row must live inside one slice (TP never crosses DCN).
    for row in m.devices:
        assert len({d.id // 4 for d in row}) == 1
    # DP axis crosses the slices.
    assert {m.devices[0, 0].id // 4, m.devices[1, 0].id // 4} == {0, 1}


def test_hybrid_mesh_tp_cannot_cross_dcn(monkeypatch):
    _fake_two_slices(monkeypatch)
    with pytest.raises(ValueError, match="must not cross DCN"):
        build_mesh(tensor_parallel_size=8, data_parallel_size=1)


def test_hybrid_mesh_dp_divisibility(monkeypatch):
    _fake_two_slices(monkeypatch)
    # dp=3 over 2 slices can't split evenly.
    with pytest.raises(ValueError, match="divisible"):
        build_mesh(tensor_parallel_size=2, data_parallel_size=3,
                   devices=jax.devices()[:4] + jax.devices()[4:6])


def test_hybrid_mesh_runs_collective(monkeypatch):
    _fake_two_slices(monkeypatch)
    m = build_mesh(tensor_parallel_size=2, data_parallel_size=4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(np.arange(32, dtype=np.float32).reshape(8, 4),
                       NamedSharding(m, P("dp", "tp")))
    y = jax.jit(lambda a: a.sum())(x)
    assert float(y) == float(np.arange(32).sum())
