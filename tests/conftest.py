"""Test harness config: run JAX on a virtual 8-device CPU mesh so mesh /
sharding logic is exercised without TPU hardware (SURVEY.md §4: the TPU
analog of the reference's fake-heavy-dependency test pattern).

Import-order constraints in this environment:
  - torch before jax (OpenMP runtime clash deadlocks otherwise);
  - the axon sitecustomize force-sets jax_platforms="axon,cpu", so we
    override via jax.config *after* importing jax, before any backend init.
"""

import os

# torch must be imported before jax initializes its CPU backend: loading
# torch's OpenMP runtime after XLA's leads to a futex deadlock.
import torch  # noqa: F401  (import order matters)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("LVT_ATTENTION_BACKEND", "reference")
os.environ["LVT_PLATFORM"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_tiny_bert_config(**overrides):
    cfg = dict(
        architectures=["BertModel"],
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=128,
        type_vocab_size=2,
        layer_norm_eps=1e-12,
        hidden_act="gelu",
        pad_token_id=0,
    )
    cfg.update(overrides)
    return cfg
