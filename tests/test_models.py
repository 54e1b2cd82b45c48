"""Model layer tests: shapes, GCN dense-oracle parity, factories."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgs_gnn_tpu.models import (GCNConv, SAGEConv, GATConv, GINConv,
                                ChebConv, get_model, get_edge_mlp, init_params)


def _graph(rng, n=20, e=80, f=8):
    s = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    r = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    return x, s, r


def test_gcnconv_matches_dense_oracle(rng):
    n, e, f, h = 15, 60, 6, 4
    x, s, r = _graph(rng, n, e, f)
    layer = GCNConv(h)
    params = layer.init(jax.random.PRNGKey(0), x, s, r)
    out = layer.apply(params, x, s, r)

    # dense oracle: sym-normalized adjacency with self loops
    a = np.zeros((n, n))
    for si, ri in zip(np.asarray(s), np.asarray(r)):
        a[ri, si] += 1.0
    a += np.eye(n)
    deg = a.sum(axis=1)
    dis = np.where(deg > 0, deg ** -0.5, 0.0)
    a_norm = dis[:, None] * a * dis[None, :]
    w = np.asarray(params["params"]["lin"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    expected = a_norm @ (np.asarray(x) @ w) + b
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_gcnconv_edge_weight_changes_output(rng):
    x, s, r = _graph(rng)
    layer = GCNConv(4)
    params = layer.init(jax.random.PRNGKey(0), x, s, r)
    w = jnp.asarray(rng.uniform(0.1, 1.0, s.shape[0]).astype(np.float32))
    out1 = layer.apply(params, x, s, r)
    out2 = layer.apply(params, x, s, r, w)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_sage_gat_gin_cheb_shapes(rng):
    x, s, r = _graph(rng)
    n = x.shape[0]
    for layer in [SAGEConv(5), GATConv(5, heads=2), GINConv(7, 5),
                  ChebConv(5, K=3)]:
        params = layer.init(jax.random.PRNGKey(0), x, s, r)
        out = layer.apply(params, x, s, r)
        expect_f = 10 if isinstance(layer, GATConv) else 5
        assert out.shape == (n, expect_f)
        assert np.isfinite(np.asarray(out)).all()


def test_gat_attention_rows_normalized(rng):
    # With identical node features attention must average neighbors: output
    # of a node with any in-degree equals output of a self-loop-only node.
    n, f = 8, 6
    x = jnp.ones((n, f))
    s = jnp.asarray([0, 1, 2, 3], dtype=jnp.int32)
    r = jnp.asarray([4, 4, 4, 5], dtype=jnp.int32)
    layer = GATConv(5)
    params = layer.init(jax.random.PRNGKey(0), x, s, r)
    out = np.asarray(layer.apply(params, x, s, r))
    np.testing.assert_allclose(out[4], out[5], rtol=1e-5)


def test_cheb_k1_is_linear(rng):
    # K=1 ChebConv must ignore graph structure entirely (reference uses K=1).
    x, s, r = _graph(rng)
    layer = ChebConv(4, K=1)
    params = layer.init(jax.random.PRNGKey(0), x, s, r)
    out1 = layer.apply(params, x, s, r)
    s2 = jnp.zeros_like(s)  # completely different graph
    out2 = layer.apply(params, x, s2, r)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


@pytest.mark.parametrize("gnn", ["GCN", "GIN", "GAT", "Cheb"])
@pytest.mark.parametrize("scorer", ["MLP", "GSAGE", "GCN"])
def test_backbone_and_scorer_factories(rng, gnn, scorer):
    n, e, f, c = 20, 80, 8, 3
    x, s, r = _graph(rng, n, e, f)
    model = get_model(gnn, f, 16, c, 0.3, scorer)
    params = init_params(model, jax.random.PRNGKey(0), x, s, r)
    logits = model.apply(params, x, s, r)
    assert logits.shape == (n, c)
    probs = model.apply(params, x, s, r, s, r, method="score_edges")
    assert probs.shape == (e,)
    pv = np.asarray(probs)
    assert ((pv > 0) & (pv < 1)).all()
    # parameter-name partitioning hook: top-level submodule names
    top = set(params["params"].keys())
    assert "edge_prob_mlp" in top


def test_param_groups_match_reference_name_filters(rng):
    """The reference partitions params by name substring (main.py:98-123);
    our module names must reproduce those groups."""
    x, s, r = _graph(rng)
    model = get_model("GCN", 8, 16, 3, 0.3, "GCN")
    params = init_params(model, jax.random.PRNGKey(0), x, s, r)
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    gnn_group = [n for n in names if "gcn" in n]
    edge_group = [n for n in names if "edge_prob_mlp" in n]
    # backbone convs in gnn group
    assert any("'gcn1'" in n and "edge_prob_mlp" not in n for n in gnn_group)
    # the scorer's GCN encoder lands in BOTH groups (reference quirk:
    # 'gcn' in 'edge_prob_mlp.gcn1...' is True)
    assert any("edge_prob_mlp" in n for n in gnn_group)
    assert len(edge_group) > 0
