"""Test environment: force an 8-device virtual CPU mesh.

This is the standard JAX way to test multi-chip sharding without hardware
(SURVEY.md section 4): all tests run on CPU with 8 virtual devices so
shard_map / pjit paths execute real collectives.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU tunnel (axon) registers itself via sitecustomize before conftest
# runs and force-sets jax_platforms; override it back to CPU — backends
# initialize lazily, so this takes effect as long as no array has been
# created yet.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_graph(rng, n=50, e=400, f=16, c=4, seed_prior=True):
    """Small random directed graph fixture with masks + degree-ish prior."""
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, c, size=n).astype(np.int32)
    perm = rng.permutation(n)
    train = np.zeros(n, bool); train[perm[: n // 3]] = True
    val = np.zeros(n, bool); val[perm[n // 3: 2 * n // 3]] = True
    test = np.zeros(n, bool); test[perm[2 * n // 3:]] = True
    prob = rng.uniform(0.1, 1.0, size=e).astype(np.float32)
    prob = prob / prob.sum()
    from sgs_gnn_tpu.core.graph import Graph
    return Graph.build(x, np.stack([senders, receivers]), y, train, val,
                       test, prob=prob, num_classes=c)


@pytest.fixture
def small_graph(rng):
    return random_graph(rng)
