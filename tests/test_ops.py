"""Parity tests for sparse ops against dense oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgs_gnn_tpu.ops import (spmm_xla, gcn_norm, segment_softmax,
                             gumbel_topk, uniform_topk)


def _dense_adj(senders, receivers, weights, n):
    a = np.zeros((n, n), dtype=np.float64)
    for s, r, w in zip(senders, receivers, weights):
        a[r, s] += w
    return a


def test_spmm_matches_dense(rng):
    n, e, f = 30, 200, 8
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    out = spmm_xla(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w),
                   jnp.asarray(x), n)
    expected = _dense_adj(s, r, w, n) @ x.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_spmm_grads_match_dense(rng):
    n, e, f = 12, 60, 5
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = jnp.asarray(rng.normal(size=e).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def loss_sparse(w_, x_):
        return jnp.sum(jnp.sin(spmm_xla(sj, rj, w_, x_, n)))

    def loss_dense(w_, x_):
        a = jnp.zeros((n, n)).at[rj, sj].add(w_)
        return jnp.sum(jnp.sin(a @ x_))

    gw1, gx1 = jax.grad(loss_sparse, argnums=(0, 1))(w, x)
    gw2, gx2 = jax.grad(loss_dense, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4,
                               atol=1e-4)


def test_gcn_norm_row_normalizes_regular_graph():
    # ring graph where every node has in/out degree 1 -> with self loops
    # deg=2, so each coefficient is 1/2.
    n = 6
    s = jnp.arange(n, dtype=jnp.int32)
    r = jnp.roll(s, -1)
    s2, r2, w = gcn_norm(s, r, None, n)
    assert s2.shape == (2 * n,)
    np.testing.assert_allclose(np.asarray(w), 0.5, rtol=1e-6)


def test_gcn_norm_zero_degree_is_zero():
    # node 2 is isolated (no in edges, no self loop contribution besides its
    # own); with add_loops its degree is 1 -> coefficient 1.
    s = jnp.asarray([0], dtype=jnp.int32)
    r = jnp.asarray([1], dtype=jnp.int32)
    s2, r2, w = gcn_norm(s, r, None, 3, add_loops=False)
    # without self loops node 1 has degree 1, norm = 1/sqrt(d_s=0?) -> senders
    # degree of node 0 is 0 so coefficient must be 0, not inf/nan
    assert np.isfinite(np.asarray(w)).all()


def test_segment_softmax_sums_to_one(rng):
    e, n = 64, 7
    seg = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    logits = jnp.asarray(rng.normal(size=e).astype(np.float32))
    p = segment_softmax(logits, seg, n)
    sums = jax.ops.segment_sum(p, seg, num_segments=n)
    counts = jax.ops.segment_sum(jnp.ones(e), seg, num_segments=n)
    expected = np.where(np.asarray(counts) > 0, 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(sums), expected, rtol=1e-5, atol=1e-5)


def test_gumbel_topk_no_replacement_and_masked():
    key = jax.random.PRNGKey(0)
    probs = jnp.asarray([0.5, 0.3, 0.1, 0.05, 0.05, 0.0])
    mask = jnp.asarray([True, True, True, True, True, False])
    for i in range(20):
        idx = gumbel_topk(jax.random.fold_in(key, i), probs, 3, mask=mask)
        assert len(set(np.asarray(idx).tolist())) == 3
        assert 5 not in np.asarray(idx)


def test_gumbel_topk_matches_multinomial_frequencies():
    # Empirical marginal inclusion frequencies of Gumbel-top-k should match
    # multinomial-without-replacement (estimated by a numpy simulation).
    p = np.asarray([0.5, 0.25, 0.15, 0.07, 0.03])
    q, trials = 2, 4000
    key = jax.random.PRNGKey(1)
    draw = jax.jit(lambda k: gumbel_topk(k, jnp.asarray(p), q))
    counts = np.zeros(5)
    for i in range(trials):
        counts[np.asarray(draw(jax.random.fold_in(key, i)))] += 1
    freq = counts / trials

    np_rng = np.random.default_rng(0)
    ref_counts = np.zeros(5)
    for _ in range(trials):
        sel = np_rng.choice(5, size=q, replace=False, p=p)
        ref_counts[sel] += 1
    ref_freq = ref_counts / trials
    np.testing.assert_allclose(freq, ref_freq, atol=0.05)


def test_uniform_topk_uniform():
    key = jax.random.PRNGKey(2)
    counts = np.zeros(10)
    for i in range(2000):
        idx = uniform_topk(jax.random.fold_in(key, i), 10, 3)
        counts[np.asarray(idx)] += 1
    freq = counts / 2000
    np.testing.assert_allclose(freq, 0.3, atol=0.05)
