"""Baseline sparsifiers: NeuralSparse per-node top-k, SparseGAT L0 gates."""
import numpy as np
import jax
import jax.numpy as jnp

from sgs_gnn_tpu.baselines import (NeuralSparseGCN, per_node_topk_mask,
                                   SparseGAT, l0_penalty)
from test_train import _homophilous_graph


def test_per_node_topk_mask_exact(rng):
    n, e, k = 10, 100, 3
    receivers = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    scores = jnp.asarray(rng.normal(size=e).astype(np.float32))
    keep = np.asarray(per_node_topk_mask(scores, receivers, n, k))
    r = np.asarray(receivers); s = np.asarray(scores)
    for node in range(n):
        idx = np.where(r == node)[0]
        if len(idx) == 0:
            continue
        expected = set(idx[np.argsort(-s[idx])[:k]].tolist())
        assert set(idx[keep[idx]].tolist()) == expected, node


def test_neuralsparse_trains(rng):
    g = _homophilous_graph(rng, n=80)
    model = NeuralSparseGCN(hidden_dim=16, num_classes=g.num_classes, k=4)
    key = jax.random.PRNGKey(0)
    params = model.init(key, g.x, g.senders, g.receivers, key)

    def loss_fn(p, k):
        out = model.apply(p, g.x, g.senders, g.receivers, k,
                          deterministic=True)
        logp = jax.nn.log_softmax(out)
        nll = -jnp.take_along_axis(logp, g.y[:, None], 1)[:, 0]
        m = g.train_mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.sum(m)

    step = jax.jit(jax.value_and_grad(loss_fn))
    p = params
    losses = []
    for i in range(25):
        l, gr = step(p, jax.random.fold_in(key, i))
        p = jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, gr)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_sparsegat_trains_and_sparsifies(rng):
    g = _homophilous_graph(rng, n=60)
    model = SparseGAT(hidden_dim=16, num_classes=g.num_classes)
    key = jax.random.PRNGKey(0)
    params = model.init(key, g.x, g.senders, g.receivers, key)

    def loss_fn(p, k):
        out, l0 = model.apply(p, g.x, g.senders, g.receivers, k,
                              deterministic=False,
                              rngs={"dropout": k})
        logp = jax.nn.log_softmax(out)
        nll = -jnp.take_along_axis(logp, g.y[:, None], 1)[:, 0]
        m = g.train_mask.astype(jnp.float32)
        ce = jnp.sum(nll * m) / jnp.sum(m)
        return ce + 1e-3 * l0 / g.num_edges

    step = jax.jit(jax.value_and_grad(loss_fn))
    p = params
    losses = []
    for i in range(25):
        l, gr = step(p, jax.random.fold_in(key, i))
        p = jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, gr)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    w = np.asarray(SparseGAT.edge_weights(p))
    assert w.shape == (g.num_edges,)
    assert (w >= 0).all() and (w <= 1).all()
    # L0 pressure should close some gates below their init value
    w0 = np.asarray(SparseGAT.edge_weights(params))
    assert w.mean() < w0.mean() + 1e-6
