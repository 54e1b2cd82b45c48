"""Aux subsystems: checkpoint/resume, viz, profiler, scripts, CLI parsing."""
import os
import subprocess

import numpy as np
import jax
import jax.numpy as jnp

from sgs_gnn_tpu.core import Config
from sgs_gnn_tpu.models import get_model, init_params
from sgs_gnn_tpu.train import DualOptimizer
from sgs_gnn_tpu.run.checkpoint import (TrainState, save_checkpoint,
                                        load_checkpoint)
from sgs_gnn_tpu.run.cli import config_from_args
from test_train import _homophilous_graph


def test_checkpoint_roundtrip(tmp_path, rng):
    g = _homophilous_graph(rng, n=30)
    model = get_model("GCN", g.x.shape[1], 8, g.num_classes, 0.3, "MLP")
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    opt = DualOptimizer.create(params, "GCN", 1e-3, 5e-4)
    st = opt.init(params)
    state = TrainState(params=params, opt_state=st, epoch=7,
                       best_val_f1=0.5, best_temperature=0.63,
                       losses=[1.0, 0.9])
    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, params, st)
    assert restored.epoch == 7 and restored.best_temperature == 0.63
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_checkpoint(str(tmp_path / "missing.pkl"), params, st) is None


def test_viz_smoke(tmp_path, rng):
    from sgs_gnn_tpu.viz import (plot_learning_curves, plot_probs, plot_hist,
                                 visualize_graphs_side_by_side, reduce_2d,
                                 plot_embeddings_2d,
                                 count_edges_with_different_labels)
    g = _homophilous_graph(rng, n=40)
    y = np.asarray(g.y)
    p1 = plot_learning_curves(0, [0.1, 0.5], [0.1, 0.4], [0.1, 0.3],
                              path=str(tmp_path / "curves.png"))
    assert os.path.getsize(p1) > 0
    probs = rng.uniform(0, 1, g.num_edges)
    p2 = plot_probs(probs, probs / probs.sum(), path=str(tmp_path / "p.png"))
    p3 = plot_hist(probs, probs, probs[:10], probs[:10],
                   path=str(tmp_path / "h.png"))
    ei = np.asarray(g.edge_index)
    p4 = visualize_graphs_side_by_side(ei, ei[:, :50], y,
                                       path=str(tmp_path / "g.png"))
    for p in (p2, p3, p4):
        assert os.path.getsize(p) > 0
    emb2 = reduce_2d(rng.normal(size=(40, 16)), "pca")
    assert emb2.shape == (40, 2)
    p5 = plot_embeddings_2d(emb2, y, path=str(tmp_path / "e.png"))
    assert os.path.getsize(p5) > 0
    het = count_edges_with_different_labels(ei[0], ei[1], y)
    assert 0.0 <= het["heterophily"] <= 1.0


def test_extract_embeddings(rng):
    from sgs_gnn_tpu.viz import extract_embeddings
    g = _homophilous_graph(rng, n=25)
    model = get_model("GCN", g.x.shape[1], 12, g.num_classes, 0.3, "MLP")
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    emb = extract_embeddings(model, params, g)
    assert emb.shape == (25, 12)
    logits = extract_embeddings(model, params, g, layer="logits")
    assert logits.shape == (25, g.num_classes)


def test_profiler_segment_timer():
    from sgs_gnn_tpu.utils import SegmentTimer, timed, device_memory_mb
    t = SegmentTimer()
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((64, 64))
    dt = t.time_segment("gnn_forward", f, x, iters=2)
    assert dt > 0
    s = t.summarize()
    assert "gnn_forward" in s and s["gnn_forward"]["calls"] == 1
    lines = []
    t.report(log_fn=lines.append)
    assert "gnn_forward" in lines[0]


def test_cli_config_parsing():
    cfg = config_from_args(["--dataset", "Karate", "--pipeline", "hybrid",
                            "--reg1", "false", "--nhid", "64",
                            "--sample_perc", "0.5"])
    assert cfg.dataset == "Karate" and cfg.pipeline == "hybrid"
    assert cfg.reg1 is False and cfg.nhid == 64 and cfg.sample_perc == 0.5
    # unknown args tolerated (parse_known_args, like the reference)
    cfg2 = config_from_args(["--dataset", "Karate", "--bogus", "1"])
    assert cfg2.dataset == "Karate"


def test_scripts_are_wellformed():
    import glob
    scripts = glob.glob("Scripts/*.sh")
    assert len(scripts) >= 9
    for s in scripts:
        r = subprocess.run(["bash", "-n", s], capture_output=True)
        assert r.returncode == 0, (s, r.stderr)


def test_serve_sparsify_and_predict(rng):
    from sgs_gnn_tpu.run.serve import make_sparsifier, make_predictor
    g = _homophilous_graph(rng, n=60)
    cfg = Config(num_samples_eval=3)
    q = g.num_edges // 4
    model = get_model("GCN", g.x.shape[1], 16, g.num_classes, 0.3, "GCN")
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    sp = make_sparsifier(cfg, model, q)(params, g, jax.random.PRNGKey(1))
    assert sp.senders.shape == (q,) and sp.probs.shape == (g.num_edges,)
    # kept-edge weights equal the learned prob at the kept ids
    np.testing.assert_allclose(np.asarray(sp.weights),
                               np.asarray(sp.probs)[np.asarray(sp.edge_ids)],
                               rtol=1e-6)
    logits, labels = make_predictor(cfg, model, q)(params, g,
                                                   jax.random.PRNGKey(2))
    assert logits.shape == (60, g.num_classes) and labels.shape == (60,)


def test_approx_topk_sampling_close_to_exact(rng):
    """approx_max_k sampling must keep marginal inclusion frequencies close
    to exact Gumbel-top-k."""
    from sgs_gnn_tpu.sparsify import sample_edges
    import jax.numpy as jnp
    e, q = 1000, 100
    probs = jnp.asarray(rng.uniform(0.01, 1.0, e).astype(np.float32))
    prior = jnp.full((e,), 1.0 / e)
    counts_exact = np.zeros(e)
    counts_approx = np.zeros(e)
    for i in range(200):
        k = jax.random.PRNGKey(i)
        ie, _ = sample_edges(k, probs, prior, q, 0.3)
        ia, _ = sample_edges(k, probs, prior, q, 0.3, approx=True)
        counts_exact[np.asarray(ie)] += 1
        counts_approx[np.asarray(ia)] += 1
    # aggregate inclusion frequency of the top-decile edges should agree
    top = np.argsort(-np.asarray(probs))[:100]
    fe = counts_exact[top].mean() / 200
    fa = counts_approx[top].mean() / 200
    assert abs(fe - fa) < 0.05, (fe, fa)


def test_debug_validate_graph_and_checked(rng):
    from sgs_gnn_tpu.utils import validate_graph, checked, find_nans
    import pytest as _pytest
    g = _homophilous_graph(rng, n=20)
    validate_graph(g)  # healthy graph passes
    bad = g.replace(senders=jnp.full_like(g.senders, 99))
    with _pytest.raises(ValueError, match="out of range"):
        validate_graph(bad)

    f = checked(lambda x: jnp.log(x))
    out = f(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(out), 0.0)
    with _pytest.raises(Exception):
        f(jnp.zeros(4) - 1.0)  # log of negative -> nan check fires

    assert find_nans({"a": jnp.ones(3), "b": jnp.asarray([jnp.nan])}) == ["b"]


def test_config_validate_catches_typos(tmp_path):
    from sgs_gnn_tpu.core.config import Config
    import pytest as _pytest
    Config(dataset="SyntheticSBM").validate()          # baseline OK
    for kw in ({"dataset": "Redit"}, {"dtype": "fp16"},
               {"data_parallel": "yes"}, {"sample_perc": 0.0},
               {"prng_impl": "philox"}, {"t_init": 0.1, "t_min": 0.5},
               {"mode": "lernt"}, {"epochs": 0}, {"drop_rate": 1.5}):
        with _pytest.raises(ValueError):
            Config(**kw).validate()
    # unknown dataset name is allowed when an npz cache exists
    import numpy as np_
    p = tmp_path / "mygraph.npz"
    np_.savez(p, x=np_.zeros((2, 2)), edge_index=np_.zeros((2, 1)),
              y=np_.zeros(2))
    Config(dataset="mygraph", data_dir=str(tmp_path)).validate()


def test_validate_graph_flags_stale_receiver_band(rng):
    from sgs_gnn_tpu.core.graph import Graph
    from sgs_gnn_tpu.utils.debug import validate_graph
    import pytest as _pytest
    n, e = 30, 300
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    y = rng.integers(0, 3, n).astype(np.int32)
    g = Graph.build(x, np.stack([s, r]), y, sort_by_receiver=True)
    validate_graph(g)                                   # correct band passes
    bad = g.replace(receiver_band=8) if g.receiver_band > 8 else g
    if bad.receiver_band < g.receiver_band:
        with _pytest.raises(ValueError, match="band"):
            validate_graph(bad)
    # unsorted receivers with a declared band must fail
    g2 = Graph.build(x, np.stack([s, r]), y).replace(receiver_band=64)
    with _pytest.raises(ValueError, match="sorted"):
        validate_graph(g2)


def test_segment_profiler_names_and_values(rng, small_graph):
    from sgs_gnn_tpu.core.config import Config
    from sgs_gnn_tpu.models import get_model, init_params
    from sgs_gnn_tpu.utils.profiler import make_segment_profiler, SegmentTimer
    import jax as _jax
    g = small_graph
    cfg = Config(mode="learned", pipeline="hybrid", conditional=True)
    q = 100
    model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type, dtype=cfg.dtype)
    params = init_params(model, _jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    prof = make_segment_profiler(cfg, model, q)
    ms, mb = prof(params, g, _jax.random.PRNGKey(1))
    assert set(ms) == set(SegmentTimer.SEGMENTS)
    assert set(mb) == set(SegmentTimer.SEGMENTS)
    assert all(v >= 0 for v in ms.values())
    # per-segment peak-increment MB (R1 parity): non-negative, finite
    assert all(v >= 0 and np.isfinite(v) for v in mb.values())
    # non-learned mode: scorer segments report zero
    cfg2 = Config(mode="random")
    prof2 = make_segment_profiler(cfg2, model, q)
    ms2, mb2 = prof2(params, g, _jax.random.PRNGKey(2))
    assert ms2["edge_mlp_pre"] == 0.0 and ms2["edge_score"] == 0.0
    assert mb2["edge_mlp_pre"] == 0.0
    assert ms2["backward"] > 0


def test_fastpath_status_lines(small_graph):
    """log_fastpath_status emits one line per fast path with a reason."""
    from sgs_gnn_tpu.core import Config
    from sgs_gnn_tpu.run.driver import log_fastpath_status, want_tile_index
    g = small_graph
    lines = []
    cfg = Config(mode="learned", pipeline="hybrid")
    log_fastpath_status(cfg, [g], q=100, log_fn=lines.append)
    assert len(lines) == 6
    assert all(ln.startswith("[fastpath]") for ln in lines)
    # CPU backend: tile=auto declines, dense=auto declines, scatter off
    assert "tile_score_kernel=off" in lines[0]
    assert "dense_subgraph=off" in lines[1]
    assert "scatter_mxu_kernel=off" in lines[2]
    assert "fused_sampled_head=off" in lines[3]
    assert "sorted_head=off" in lines[4]
    assert "sampling_topk=exact" in lines[5]
    # approx_topk on a CPU backend: bf16 keys report off with the backend
    lines_b = []
    log_fastpath_status(cfg.replace(approx_topk=True), [g], q=100,
                        log_fn=lines_b.append)
    assert "sampling_topk=approx" in lines_b[5]
    assert "bf16_keys=off (backend=cpu)" in lines_b[5]
    lines_c = []
    log_fastpath_status(cfg.replace(approx_topk=True, topk_bf16=False),
                        [g], q=100, log_fn=lines_c.append)
    assert "bf16_keys=off (--topk_bf16 off)" in lines_c[5]
    # every off-line carries a parenthesized reason
    assert all("(" in ln for ln in lines)
    # non-hybrid pipelines report the tile kernel as not applicable
    lines2 = []
    log_fastpath_status(Config(mode="random"), [g], q=100,
                        log_fn=lines2.append)
    assert "hybrid_rescore" in lines2[0]


def test_want_tile_index_decision():
    from sgs_gnn_tpu.core import Config
    from sgs_gnn_tpu.run.driver import want_tile_index
    base = dict(mode="learned", pipeline="hybrid")
    assert want_tile_index(Config(**base, tile_index="on"))
    assert not want_tile_index(Config(**base, tile_index="off"))
    # auto on CPU declines
    assert not want_tile_index(Config(**base))
    # wide heads exceed the VMEM budget
    assert not want_tile_index(Config(**base, tile_index="on", nhid=640))
    # sharded paths score via XLA
    assert not want_tile_index(Config(**base, tile_index="on",
                                      data_parallel="on"))
    assert not want_tile_index(Config(**base, tile_index="on", halo=True))
    # serves the hybrid_rescore path only
    assert not want_tile_index(Config(mode="learned", pipeline="two_pass",
                                      tile_index="on"))
