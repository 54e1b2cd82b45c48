"""Ensemble evaluator tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgs_gnn_tpu.core import Config
from sgs_gnn_tpu.models import get_model, init_params
from sgs_gnn_tpu.eval import make_eval_step, aggregate_eval
from test_train import _homophilous_graph


@pytest.mark.parametrize("mode", ["learned", "random", "edge", "full"])
def test_eval_modes_run(rng, mode):
    g = _homophilous_graph(rng, n=60)
    cfg = Config(mode=mode, nhid=16, num_samples_eval=5)
    q = int(g.num_edges * 0.3)
    model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type)
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    ev = make_eval_step(cfg, model, q)
    res = ev(params, g, jax.random.PRNGKey(1), jnp.asarray(0.7))
    agg = aggregate_eval([res])
    for split in ("train", "val", "test"):
        assert 0.0 <= agg[f"{split}_f1"] <= 1.0


def test_eval_aggregation_weighted(rng):
    # two fake partition results with known weighted mean
    r1 = {"train_f1_weighted": jnp.asarray(0.8 * 10), "train_count": jnp.asarray(10.0),
          "val_f1_weighted": jnp.asarray(0.0), "val_count": jnp.asarray(0.0),
          "test_f1_weighted": jnp.asarray(0.5 * 4), "test_count": jnp.asarray(4.0)}
    r2 = {"train_f1_weighted": jnp.asarray(0.2 * 30), "train_count": jnp.asarray(30.0),
          "val_f1_weighted": jnp.asarray(1.0 * 5), "val_count": jnp.asarray(5.0),
          "test_f1_weighted": jnp.asarray(0.0), "test_count": jnp.asarray(0.0)}
    agg = aggregate_eval([r1, r2])
    np.testing.assert_allclose(agg["train_f1"], (8 + 6) / 40)
    np.testing.assert_allclose(agg["val_f1"], 1.0)
    np.testing.assert_allclose(agg["test_f1"], 0.5)


def test_ensemble_beats_or_matches_single_draw_variance(rng):
    """Averaging 11 draws should give a deterministic-ish F1: two different
    eval keys must produce closer F1s than two single-draw evals."""
    g = _homophilous_graph(rng, n=100)
    q = int(g.num_edges * 0.2)
    model = get_model("GCN", g.x.shape[1], 32, g.num_classes, 0.3, "GCN")
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    cfg_ens = Config(mode="learned", num_samples_eval=11)
    cfg_one = Config(mode="learned", num_samples_eval=1)
    ev_ens = make_eval_step(cfg_ens, model, q)
    ev_one = make_eval_step(cfg_one, model, q)

    def spread(ev):
        f1s = [aggregate_eval([ev(params, g, jax.random.PRNGKey(s),
                                  jnp.asarray(0.7))])["test_f1"]
               for s in range(6)]
        return np.std(f1s)

    assert spread(ev_ens) <= spread(ev_one) + 1e-9
