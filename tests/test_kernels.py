"""Pallas kernel + custom-VJP gather tests (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from sgs_gnn_tpu.ops.scatter_pallas import scatter_add_pallas
from sgs_gnn_tpu.ops.edge_gather import gather_rows


def test_scatter_pallas_interpret_matches_segment_sum(rng):
    e, f, n = 700, 128, 40
    vals = jnp.asarray(rng.normal(size=(e, f)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    out = scatter_add_pallas(vals, ids, n, block=256, interpret=True)
    ref = jax.ops.segment_sum(vals, ids, num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_scatter_pallas_handles_padding(rng):
    # e not a multiple of block: padded items must scatter zeros
    e, f, n = 100, 128, 10
    vals = jnp.ones((e, f))
    ids = jnp.zeros(e, jnp.int32)
    out = scatter_add_pallas(vals, ids, n, block=64, interpret=True)
    np.testing.assert_allclose(float(out[0, 0]), e)
    np.testing.assert_allclose(np.asarray(out[1:]), 0.0)


def test_gather_rows_forward_and_grad(rng):
    n, f, e = 30, 16, 200
    table = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    out = gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))

    def loss(t):
        return jnp.sum(jnp.sin(gather_rows(t, idx)))

    def loss_ref(t):
        return jnp.sum(jnp.sin(t[idx]))

    g1 = jax.grad(loss)(table)
    g2 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)


def test_gather_rows_under_jit_and_vmap(rng):
    n, f = 20, 8
    table = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (4, 50)).astype(np.int32))
    out = jax.jit(jax.vmap(gather_rows, in_axes=(None, 0)))(table, idx)
    assert out.shape == (4, 50, f)
    np.testing.assert_array_equal(np.asarray(out[2]),
                                  np.asarray(table[idx[2]]))
