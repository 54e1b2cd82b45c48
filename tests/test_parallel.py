"""Partition-parallel training on an 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgs_gnn_tpu.core import Config
from sgs_gnn_tpu.data import (sbm_graph, to_undirected, partition_nodes,
                              induced_subgraphs)
from sgs_gnn_tpu.models import get_model, init_params
from sgs_gnn_tpu.train import DualOptimizer, micro_f1
from sgs_gnn_tpu.parallel import (make_mesh, stack_batches,
                                  make_parallel_train_step,
                                  make_parallel_eval_step, device_count)
from sgs_gnn_tpu.eval import aggregate_eval


def _partitioned_fixture(n_parts):
    x, ei, y, (tr, va, te) = sbm_graph(n=400, num_classes=4, deg=12, h=0.8,
                                       seed=0)
    ei = to_undirected(ei)
    part = partition_nodes(ei, 400, n_parts)
    graphs = induced_subgraphs(x, ei, y, tr, va, te, part, n_parts)
    return graphs, x.shape[1], int(y.max()) + 1


def test_virtual_mesh_has_8_devices():
    assert device_count() == 8


def test_parallel_step_trains_and_improves():
    n_dev = 8
    graphs, f, c = _partitioned_fixture(n_dev)
    mesh = make_mesh(n_dev)
    cfg = Config(pipeline="hybrid", mode="learned", nhid=32, donate=False,
                 num_samples_eval=3)
    q = max(int(min(int(np.asarray(g.edge_mask).sum()) for g in graphs) * 0.5),
            8)
    model = get_model(cfg.GNN, f, cfg.nhid, c, cfg.drop_rate,
                      cfg.edge_mlp_type)
    g0 = graphs[0]
    params = init_params(model, jax.random.PRNGKey(0), g0.x, g0.senders,
                         g0.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_parallel_train_step(cfg, model, opt, q, 30, mesh)
    stacked = stack_batches(graphs)

    key = jax.random.PRNGKey(1)
    for epoch in range(30):
        params, opt_state, m = step(params, opt_state, stacked,
                                    jnp.asarray(epoch),
                                    jax.random.fold_in(key, epoch))
    assert np.isfinite(float(m.loss))

    ev = make_parallel_eval_step(cfg, model, q, mesh)
    res = ev(params, stacked, jax.random.PRNGKey(2), jnp.asarray(0.5))
    agg = aggregate_eval([res])
    assert agg["train_f1"] > 0.5, agg


def test_parallel_matches_sequential_gradients():
    """One parallel super-step with gates forced on must equal the average
    of per-partition gradients: check parameters after one step
    with conditional off (gate always true on every shard)."""
    n_dev = 4
    graphs, f, c = _partitioned_fixture(n_dev)
    mesh = make_mesh(n_dev)
    cfg = Config(pipeline="hybrid", mode="learned", conditional=False,
                 reg1=False, reg2=False, drop_rate=0.0, nhid=16,
                 donate=False)
    q = 64
    model = get_model(cfg.GNN, f, cfg.nhid, c, 0.0, cfg.edge_mlp_type)
    g0 = graphs[0]
    params = init_params(model, jax.random.PRNGKey(0), g0.x, g0.senders,
                         g0.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)

    # parallel: one step on the mesh
    step = make_parallel_train_step(cfg, model, opt, q, 10, mesh)
    p_par, _, m = step(params, opt.init(params), stack_batches(graphs),
                       jnp.asarray(0), jax.random.PRNGKey(7))

    # manual: average per-partition grads computed with the same per-shard
    # keys, single dual-Adam step
    from sgs_gnn_tpu.train.pipelines import make_learned_loss
    loss_fn = make_learned_loss(cfg, model, q)
    key = jax.random.PRNGKey(7)
    grads_acc = None
    for i, g in enumerate(graphs):
        (_, _), gr = jax.value_and_grad(loss_fn, has_aux=True)(
            params, g, jax.random.fold_in(key, i))
        grads_acc = gr if grads_acc is None else jax.tree_util.tree_map(
            lambda a, b: a + b, grads_acc, gr)
    grads_avg = jax.tree_util.tree_map(lambda a: a / n_dev, grads_acc)
    p_seq, _ = opt.step_learned(params, grads_avg, opt.init(params),
                                jnp.asarray(True))

    flat_par = jax.tree_util.tree_leaves(p_par)
    flat_seq = jax.tree_util.tree_leaves(p_seq)
    for a, b in zip(flat_par, flat_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_parallel_step_underfilled_shards():
    """q larger than some shards' VALID edge counts: padding selections must
    not crash (q is clamped to the padded array by the driver) nor corrupt
    weights/regs (they are masked in make_learned_loss). Regression for the
    top_k crash at metis_threshold >> partition size."""
    n_dev = 4
    graphs, f, c = _partitioned_fixture(n_dev)
    mesh = make_mesh(n_dev)
    cfg = Config(pipeline="hybrid", mode="learned", nhid=16, donate=False,
                 reg1=True, reg2=True, conditional=True)
    padded_e = graphs[0].num_edges
    valid_min = min(int(np.asarray(g.edge_mask).sum()) for g in graphs)
    q = padded_e  # > valid count of every shard
    assert q > valid_min
    model = get_model(cfg.GNN, f, cfg.nhid, c, cfg.drop_rate,
                      cfg.edge_mlp_type)
    g0 = graphs[0]
    params = init_params(model, jax.random.PRNGKey(0), g0.x, g0.senders,
                         g0.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_parallel_train_step(cfg, model, opt, q, 5, mesh)
    stacked = stack_batches(graphs)
    key = jax.random.PRNGKey(3)
    for epoch in range(5):
        params, opt_state, m = step(params, opt_state, stacked,
                                    jnp.asarray(epoch),
                                    jax.random.fold_in(key, epoch))
        assert np.isfinite(float(m.loss)), epoch


def test_parallel_baseline_mode_step():
    """Baseline modes (random/edge/full) run on the mesh too: single-forward
    CE loss per shard, pmean'd grads, one third-optimizer update."""
    n_dev = 4
    graphs, f, c = _partitioned_fixture(n_dev)
    mesh = make_mesh(n_dev)
    for mode in ("random", "edge", "full"):
        cfg = Config(pipeline="hybrid", mode=mode, nhid=16, donate=False)
        q = 64
        model = get_model(cfg.GNN, f, cfg.nhid, c, cfg.drop_rate,
                          cfg.edge_mlp_type)
        g0 = graphs[0]
        params = init_params(model, jax.random.PRNGKey(0), g0.x, g0.senders,
                             g0.receivers)
        opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
        opt_state = opt.init(params)
        step = make_parallel_train_step(cfg, model, opt, q, 10, mesh)
        stacked = stack_batches(graphs)
        losses = []
        for epoch in range(10):
            params, opt_state, m = step(params, opt_state, stacked,
                                        jnp.asarray(epoch),
                                        jax.random.fold_in(
                                            jax.random.PRNGKey(5), epoch))
            losses.append(float(m.loss))
        assert np.isfinite(losses).all(), (mode, losses)
        assert losses[-1] < losses[0], (mode, losses)


def test_parallel_sequential_convergence_agreement():
    """Parallel (one synchronized update per super-step) and sequential
    (reference schedule: one update per batch) training must agree at
    convergence even though the trajectories differ (VERDICT round 1,
    'quality under that schedule')."""
    from sgs_gnn_tpu.run.driver import run_experiment
    from sgs_gnn_tpu.data.registry import HostDataset
    from sgs_gnn_tpu.data import to_undirected, edge_homophily, degree_prior
    x, ei, y, (tr, va, te) = sbm_graph(n=600, num_classes=4, deg=14, h=0.85,
                                       seed=1)
    ei = to_undirected(ei)
    ds = HostDataset(name="conv", x=x, edge_index=ei, y=y, train_mask=tr,
                     val_mask=va, test_mask=te,
                     prob=degree_prior(ei[0], ei[1], 600),
                     num_classes=4, He=edge_homophily(ei, y))
    base = dict(pipeline="hybrid", mode="learned", nhid=32, epochs=25,
                metis_threshold=200, num_partitions=8, save_csv=False,
                num_samples_eval=3, donate=False, convergence=0.0)
    seq = run_experiment(Config(**base), ds, log_fn=lambda *a: None)[0]
    par = run_experiment(Config(**base, data_parallel="on"), ds,
                         log_fn=lambda *a: None)[0]
    assert seq.final_test_f1 > 0.6, seq.final_test_f1
    assert par.final_test_f1 > 0.6, par.final_test_f1
    assert abs(seq.final_test_f1 - par.final_test_f1) < 0.15, (
        seq.final_test_f1, par.final_test_f1)


def test_data_parallel_driver_path():
    """run_experiment with data_parallel=on trains over the virtual mesh."""
    from sgs_gnn_tpu.run.driver import run_experiment
    from sgs_gnn_tpu.data.registry import HostDataset
    from sgs_gnn_tpu.data import to_undirected, edge_homophily, degree_prior
    x, ei, y, (tr, va, te) = sbm_graph(n=400, num_classes=4, deg=10, h=0.8,
                                       seed=0)
    ei = to_undirected(ei)
    ds = HostDataset(name="test", x=x, edge_index=ei, y=y, train_mask=tr,
                     val_mask=va, test_mask=te,
                     prob=degree_prior(ei[0], ei[1], 400),
                     num_classes=4, He=edge_homophily(ei, y))
    cfg = Config(pipeline="hybrid", mode="learned", nhid=16, epochs=6,
                 metis_threshold=100, num_partitions=8, data_parallel="on",
                 save_csv=False, num_samples_eval=2, donate=False,
                 convergence=0.0)
    res = run_experiment(cfg, ds, log_fn=lambda *a: None)[0]
    assert res.total_updates == 6 * 8
    assert 0.0 <= res.final_test_f1 <= 1.0
    assert np.isfinite(res.losses).all()


# ---------------------------------------------------------------------------
# Feature-dimension sharding (TP analogue, parallel/tensor_parallel.py)
# ---------------------------------------------------------------------------


def test_tensor_parallel_training_matches_replicated(small_graph):
    """The UNCHANGED jitted train step run with TP-sharded params (hidden
    dim split over a ("data","model") mesh, GSPMD-annotation only) follows
    the replicated trajectory: same losses, same params after k steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sgs_gnn_tpu.core import Config
    from sgs_gnn_tpu.models import get_model, init_params
    from sgs_gnn_tpu.train import DualOptimizer, make_train_step
    from sgs_gnn_tpu.parallel import make_dp_tp_mesh, shard_params_tp

    g = small_graph
    cfg = Config(mode="learned", pipeline="hybrid", GNN="GCN",
                 edge_mlp_type="GCN", conditional=True, reg1=True,
                 reg2=True, nhid=32, drop_rate=0.0, donate=False)
    model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type)
    params0 = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                          g.receivers)
    opt = DualOptimizer.create(params0, cfg.GNN, cfg.lr, cfg.weight_decay)
    q = max(g.num_edges // 3, 8)
    step = make_train_step(cfg, model, opt, q, max_epoch=5)

    mesh = make_dp_tp_mesh(dp=2, tp=4)
    params_tp = shard_params_tp(params0, mesh)
    # annotation sanity: gcn1 column-sharded, gcn2 row-sharded, GAT-free
    sh = params_tp["params"]["gcn1"]["lin"]["kernel"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, "model")
    sh2 = params_tp["params"]["gcn2"]["lin"]["kernel"].sharding
    assert sh2.spec == jax.sharding.PartitionSpec("model", None)

    from sgs_gnn_tpu.core.fastpath import pallas_enabled, set_pallas_enabled
    try:
        # shard_params_tp must have switched the Pallas routes off: the
        # kernels have no GSPMD partitioning rule (ADVICE r3)
        assert not pallas_enabled()
        key = jax.random.PRNGKey(3)
        p_r, s_r = params0, opt.init(params0)
        p_t, s_t = params_tp, opt.init(params_tp)
        for ep in range(3):
            k = jax.random.fold_in(key, ep)
            p_r, s_r, m_r = step(p_r, s_r, g, jnp.asarray(ep), k)
            p_t, s_t, m_t = step(p_t, s_t, g, jnp.asarray(ep), k)
            np.testing.assert_allclose(float(m_r.loss), float(m_t.loss),
                                       rtol=2e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5),
            p_r, p_t)
    finally:
        set_pallas_enabled(True)


def test_tensor_parallel_wide_hidden_256(small_graph):
    """TP certification at an MXU-aligned width (nhid=256, the width where
    the fused Pallas head WOULD engage on TPU): with the routes disabled by
    shard_params_tp, the sharded step lowers with no pallas custom-call and
    matches the replicated loss (ADVICE r3 medium)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sgs_gnn_tpu.core import Config
    from sgs_gnn_tpu.core.fastpath import set_pallas_enabled
    from sgs_gnn_tpu.models import get_model, init_params
    from sgs_gnn_tpu.train import DualOptimizer, make_train_step
    from sgs_gnn_tpu.parallel import make_dp_tp_mesh, shard_params_tp

    g = small_graph
    cfg = Config(mode="learned", pipeline="hybrid", GNN="GCN",
                 edge_mlp_type="GCN", nhid=256, drop_rate=0.0, donate=False)
    model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type)
    params0 = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                          g.receivers)
    opt = DualOptimizer.create(params0, cfg.GNN, cfg.lr, cfg.weight_decay)
    q = max(g.num_edges // 3, 8)
    step = make_train_step(cfg, model, opt, q, max_epoch=5)
    mesh = make_dp_tp_mesh(dp=1, tp=8)
    try:
        params_tp = shard_params_tp(params0, mesh)
        # the fused-head gate must refuse regardless of backend now
        from sgs_gnn_tpu.ops.score_sampled import use_fused_sampled_head
        assert not use_fused_sampled_head(g.num_nodes, 256, 256)
        k = jax.random.PRNGKey(5)
        p_r, s_r, m_r = step(params0, opt.init(params0), g,
                             jnp.asarray(0), k)
        p_t, s_t, m_t = step(params_tp, opt.init(params_tp), g,
                             jnp.asarray(0), k)
        np.testing.assert_allclose(float(m_r.loss), float(m_t.loss),
                                   rtol=2e-4)
    finally:
        set_pallas_enabled(True)


def test_tp_param_specs_cover_all_backbones():
    """Every backbone/scorer param gets a legal spec (kernels 2-D sharded
    or replicated; nothing crashes on GAT's attention params)."""
    import jax
    import jax.numpy as jnp
    from sgs_gnn_tpu.models import get_model, init_params
    from sgs_gnn_tpu.parallel import tp_param_spec

    for gnn in ("GCN", "GIN", "Cheb", "GAT"):
        for scorer in ("MLP", "GSAGE", "GCN"):
            m = get_model(gnn, 12, 16, 3, 0.0, scorer)
            p = init_params(m, jax.random.PRNGKey(0), jnp.ones((8, 12)),
                            jnp.zeros(10, jnp.int32),
                            jnp.zeros(10, jnp.int32))
            jax.tree_util.tree_map_with_path(
                lambda path, leaf: tp_param_spec(path, leaf), p)


def _tiny_ds(n=400, seed=0, h=0.8):
    from sgs_gnn_tpu.data.registry import HostDataset
    from sgs_gnn_tpu.data import to_undirected, edge_homophily, degree_prior
    x, ei, y, (tr, va, te) = sbm_graph(n=n, num_classes=4, deg=10, h=h,
                                       seed=seed)
    ei = to_undirected(ei)
    return HostDataset(name="resume_ds", x=x, edge_index=ei, y=y,
                       train_mask=tr, val_mask=va, test_mask=te,
                       prob=degree_prior(ei[0], ei[1], n),
                       num_classes=4, He=edge_homophily(ei, y))


def test_halo_driver_resume_mid_run(tmp_path):
    """run_experiment_halo checkpoints and resumes mid-run (driver parity
    with the sequential/parallel drivers, VERDICT r3 #8)."""
    import jax
    import jax.numpy as jnp
    from sgs_gnn_tpu.run.driver import run_experiment
    ds = _tiny_ds()
    base = dict(pipeline="hybrid", mode="learned", nhid=16, halo=True,
                save_csv=False, num_samples_eval=2, donate=False,
                convergence=0.0, results_dir=str(tmp_path),
                checkpoint_every=2)
    # phase 1: 3 epochs, checkpoint written at epoch 1 (epoch+1 % 2 == 0)
    run_experiment(Config(**base, epochs=3), ds, log_fn=lambda *a: None)
    ck = tmp_path / "ckpt"
    assert any(p.name.endswith("_halo_run0.pkl") for p in ck.iterdir())
    # phase 2: resume to 6 epochs — losses = 2 restored + 4 fresh
    res = run_experiment(Config(**base, epochs=6, resume=True), ds,
                         log_fn=lambda *a: None)[0]
    assert len(res.losses) == 6, res.losses
    assert np.isfinite(res.losses).all()
    assert 0.0 <= res.final_test_f1 <= 1.0


def test_sequential_driver_resume_mid_run(tmp_path):
    """The partitioned sequential driver resumes from its periodic
    checkpoint with the loss history intact."""
    from sgs_gnn_tpu.run.driver import run_experiment
    ds = _tiny_ds(seed=3)
    base = dict(pipeline="hybrid", mode="learned", nhid=16,
                metis_threshold=200, num_partitions=4, save_csv=False,
                num_samples_eval=2, donate=False, convergence=0.0,
                results_dir=str(tmp_path), checkpoint_every=2)
    run_experiment(Config(**base, epochs=3), ds, log_fn=lambda *a: None)
    res = run_experiment(Config(**base, epochs=6, resume=True), ds,
                         log_fn=lambda *a: None)[0]
    assert len(res.losses) == 6, res.losses
    assert np.isfinite(res.losses).all()


def test_resume_restores_best_val_params(tmp_path):
    """A resume that adds no epochs must report the final 'loaded best
    model' eval on the BEST-VAL params persisted in the checkpoint
    (TrainState.best_params_bytes), not the last-checkpoint params —
    reference best-val semantics (main.py:264-270). Deterministic
    construction: a checkpoint whose best-val snapshot (params_a) differs
    from its last params (params_b); the resumed run's final F1 must equal
    a direct eval of params_a and differ from params_b's."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from sgs_gnn_tpu.run.driver import run_experiment, prepare_batches
    from sgs_gnn_tpu.run.checkpoint import TrainState, save_checkpoint
    from sgs_gnn_tpu.models import get_model, init_params
    from sgs_gnn_tpu.train import DualOptimizer
    from sgs_gnn_tpu.eval import (make_eval_step, aggregate_eval,
                                  accumulate_eval_device)

    ds = _tiny_ds(seed=5)
    cfg = Config(pipeline="hybrid", mode="learned", nhid=16,
                 metis_threshold=200, num_partitions=4, save_csv=False,
                 num_samples_eval=2, donate=False, convergence=0.0,
                 results_dir=str(tmp_path), checkpoint_every=1,
                 scan_epoch="off", epochs=3, resume=True)
    batches, q = prepare_batches(cfg, ds)
    model = get_model(cfg.GNN, batches[0].x.shape[1], cfg.nhid,
                      ds.num_classes, cfg.drop_rate, cfg.edge_mlp_type)
    g0 = batches[0]
    params_a = init_params(model, jax.random.PRNGKey(cfg.seed * 1000),
                           g0.x, g0.senders, g0.receivers)
    params_b = init_params(model, jax.random.PRNGKey(777), g0.x,
                           g0.senders, g0.receivers)
    opt = DualOptimizer.create(params_a, cfg.GNN, cfg.lr, cfg.weight_decay)

    def driver_final_eval(params, temp):
        # replicate run_experiment's final ensemble eval key/path exactly
        run_key = jax.random.fold_in(
            jax.random.key(cfg.seed, impl=cfg.prng_impl), 1)
        fk = jax.random.fold_in(run_key, 2**31 - 1)
        ev_big = make_eval_step(cfg, model, q)
        ev_small = make_eval_step(cfg, model, q, force_small=True)
        acc = None
        for g in batches:
            valid = int(np.asarray(g.edge_mask).sum())
            ev = ev_big if valid > q else ev_small
            acc = accumulate_eval_device(acc, ev(params, g, fk,
                                                 jnp.asarray(temp)))
        return aggregate_eval([acc])["test_f1"]

    f1_a = driver_final_eval(params_a, 0.63)
    f1_b = driver_final_eval(params_b, 0.63)
    assert f1_a != f1_b, "fixture degenerate: pick different inits"

    ckpt = tmp_path / "ckpt" / (
        f"{cfg.dataset}_{cfg.mode}_{cfg.pipeline}_run0.pkl")
    save_checkpoint(str(ckpt), TrainState(
        params=params_b, opt_state=opt.init(params_b),
        epoch=cfg.epochs - 1,              # resume -> zero epochs left
        best_val_f1=0.99, test_at_best_val=f1_a, best_temperature=0.63,
        losses=[1.0] * cfg.epochs,
        best_params_bytes=serialization.to_bytes(params_a)))
    res = run_experiment(cfg, ds, log_fn=lambda *a: None)[0]
    assert res.final_test_f1 == f1_a, (res.final_test_f1, f1_a, f1_b)
