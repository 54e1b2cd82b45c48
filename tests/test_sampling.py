"""Sampler semantics: distribution parity, straight-through gradients."""
import numpy as np
import jax
import jax.numpy as jnp

from sgs_gnn_tpu.sparsify import (sample_edges, sample_prior_edges,
                                  random_edges, temperature_at)


def test_sample_edges_static_shape_and_values():
    key = jax.random.PRNGKey(0)
    e, q = 40, 10
    probs = jax.nn.sigmoid(jax.random.normal(key, (e,)))
    prior = jnp.full((e,), 1.0 / e)
    idx, w = sample_edges(key, probs, prior, q, 0.3)
    assert idx.shape == (q,) and w.shape == (q,)
    # weight VALUE equals the raw edge prob at the selected index
    np.testing.assert_allclose(np.asarray(w), np.asarray(probs)[np.asarray(idx)],
                               rtol=1e-6)


def test_sample_edges_istest_skips_prior_mixing():
    # with a prior concentrated on one edge and beta=1, training draws must
    # always include that edge; test draws must ignore the prior.
    key = jax.random.PRNGKey(1)
    e, q = 20, 1
    probs = jnp.ones((e,)) * 0.5
    prior = jnp.zeros((e,)).at[7].set(1.0)
    hits = 0
    for i in range(50):
        idx, _ = sample_edges(jax.random.fold_in(key, i), probs, prior, q,
                              degree_bias_coef=1.0, istest=False)
        hits += int(np.asarray(idx)[0] == 7)
    assert hits == 50
    test_hits = 0
    for i in range(50):
        idx, _ = sample_edges(jax.random.fold_in(key, i), probs, prior, q,
                              degree_bias_coef=1.0, istest=True)
        test_hits += int(np.asarray(idx)[0] == 7)
    assert test_hits < 25  # uniform -> ~1/20


def test_straight_through_gradient_flows_through_distribution():
    """Reference semantics (sampling.py:134-138): grad of a selected weight
    w.r.t. edge_probs has the ST term (grad through `samples`) plus the
    direct product term."""
    key = jax.random.PRNGKey(2)
    e, q = 6, 2
    prior = jnp.full((e,), 1.0 / e)

    def loss(raw):
        probs = jax.nn.sigmoid(raw)
        idx, w = sample_edges(key, probs, prior, q, 0.3)
        return jnp.sum(w)

    raw = jnp.linspace(-1.0, 1.0, e)
    g = jax.grad(loss)(raw)
    # gradient must be nonzero on more entries than just the sampled ones:
    # the normalization couples every edge through sum(p).
    assert np.count_nonzero(np.asarray(g)) > q


def test_straight_through_grad_matches_manual_formula():
    # single-edge case: fix the sampled index set, compare against the
    # hand-derived ST gradient.
    key = jax.random.PRNGKey(3)
    e, q = 5, 5  # q = e -> deterministic selection of all edges
    prior = jnp.full((e,), 1.0 / e)
    raw = jnp.asarray([0.3, -0.2, 0.8, 0.1, -0.5])

    def loss(raw_):
        probs = jax.nn.sigmoid(raw_)
        idx, w = sample_edges(key, probs, prior, q, 0.3)
        # sum of weights in index order is permutation-invariant
        return jnp.sum(w)

    g_auto = jax.grad(loss)(raw)

    def manual(raw_):
        p = jax.nn.sigmoid(raw_)
        s = p / (jnp.sum(p) + 1e-12)
        s = 0.7 * s + 0.3 * prior
        st = jax.lax.stop_gradient(1.0 - s) + s
        return jnp.sum(jnp.clip(p * st, 0.0, 1.0))

    g_manual = jax.grad(manual)(raw)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_manual),
                               rtol=1e-5, atol=1e-6)


def test_prior_and_random_sampling_masks():
    key = jax.random.PRNGKey(4)
    e, q = 30, 5
    prior = jnp.ones((e,))
    mask = jnp.arange(e) < 20
    for i in range(10):
        k = jax.random.fold_in(key, i)
        idx = sample_prior_edges(k, prior, q, edge_mask=mask)
        assert (np.asarray(idx) < 20).all()
        idx2 = random_edges(k, e, q, edge_mask=mask)
        assert (np.asarray(idx2) < 20).all()


def test_temperature_schedule():
    # reference training_hybrid.py:67-70 with defaults 0.7 -> 0.5
    np.testing.assert_allclose(float(temperature_at(0, 100, 0.7, 0.5)), 0.7,
                               rtol=1e-6)
    np.testing.assert_allclose(float(temperature_at(50, 100, 0.7, 0.5)), 0.6,
                               rtol=1e-6)
    np.testing.assert_allclose(float(temperature_at(1000, 100, 0.7, 0.5)), 0.5,
                               rtol=1e-6)
