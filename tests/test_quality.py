"""Discriminative quality protocol (VERDICT r3 #5): configs where the
LEARNED sparsifier must beat the random/prior baselines by a wide margin —
the method's core claim (reference README.md:3-5). SyntheticSBM saturates
at F1=1.0 for every mode, so only these low-homophily fixtures distinguish
a working sparsifier from a broken one."""
import numpy as np
import pytest

from sgs_gnn_tpu.core import Config
from sgs_gnn_tpu.data.registry import get_dataset
from sgs_gnn_tpu.run.driver import run_experiment


def _run(mode, **kw):
    cfg = Config(dataset="SyntheticSBMLow", mode=mode, pipeline="hybrid",
                 GNN="GCN", edge_mlp_type="GCN", conditional=True,
                 reg1=True, reg2=True, sample_perc=0.2, nhid=64,
                 epochs=60, runs=1, save_csv=False, donate=False,
                 num_samples_eval=3, convergence=0.0, **kw)
    ds = get_dataset(cfg)
    return run_experiment(cfg, ds, log_fn=lambda *a: None)[0], ds


@pytest.mark.quality
def test_learned_sparsifier_beats_random_on_low_homophily():
    """At He~0.19 with noisy features, a 20% learned edge sample must beat
    a 20% random sample decisively (measured r4: learned 0.74 +/- 0.01 vs
    random 0.30 +/- 0.003 over seeds at 100 epochs — a >40 sigma gap;
    the 0.2 margin here is ~6x the observed run spread)."""
    learned, ds = _run("learned")
    random_, _ = _run("random")
    assert ds.He < 0.25, ds.He
    assert learned.final_test_f1 > random_.final_test_f1 + 0.2, (
        learned.final_test_f1, random_.final_test_f1)


@pytest.mark.quality
def test_learned_sparsifier_beats_full_graph_on_low_homophily():
    """The learned 20% subgraph must also beat FULL-graph GCN (the
    heterophilous majority of edges actively hurts aggregation; measured
    r4: full 0.49 vs learned 0.74)."""
    learned, _ = _run("learned")
    full, _ = _run("full")
    assert learned.final_test_f1 > full.final_test_f1 + 0.1, (
        learned.final_test_f1, full.final_test_f1)
