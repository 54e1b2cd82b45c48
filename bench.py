"""Benchmark: hybrid-pipeline training throughput on a Reddit-scale cluster
partition, on whatever accelerator JAX sees (TPU under the driver).

Workload mirrors the reference's hottest configuration (BASELINE.md:
Reddit, 115 METIS parts of ~1M directed edges / ~2k nodes, q=200k edges
= metis_threshold 1M x sample_perc 0.2, --hybrid_checkpoint, conditional +
reg1 + reg2, GCN backbone + GCN scorer, nhid 256, 602 features, 41
classes). One bench step == one reference cluster-batch step.

Metric: edges processed per second = partition edge count / mean step time.
Baseline: the reference trains Reddit (114.6M directed edges/epoch) in
14.24 s/epoch on a ~22.5 GB A100-class GPU (logs/memory_Reddit_hybrid.log)
=> 8.05e6 edges/s. vs_baseline = ours / 8.05e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


REFERENCE_EDGES_PER_S = 114_615_892 / 14.24  # ~8.05e6, BASELINE.md Reddit


def build_partition(n_nodes=2048, n_edges=1_000_000, feat=602, classes=41,
                    seed=0):
    rng = np.random.default_rng(seed)
    # power-law-ish degree profile like a Reddit METIS part
    w = rng.pareto(1.5, n_nodes) + 1.0
    p = w / w.sum()
    senders = rng.choice(n_nodes, n_edges, p=p).astype(np.int32)
    receivers = rng.choice(n_nodes, n_edges, p=p).astype(np.int32)
    x = rng.normal(size=(n_nodes, feat)).astype(np.float32)
    y = rng.integers(0, classes, n_nodes).astype(np.int32)
    train = rng.random(n_nodes) < 0.66
    from sgs_gnn_tpu.core import Graph
    from sgs_gnn_tpu.data import degree_prior
    prob = degree_prior(senders, receivers, n_nodes)
    return Graph.build(x, np.stack([senders, receivers]), y, train,
                       ~train, np.zeros(n_nodes, bool), prob=prob,
                       num_classes=classes, sort_by_receiver=True,
                       tile_index=True)


def main(argv=None):
    import sys
    argv = sys.argv[1:] if argv is None else argv
    # --hybrid_checkpoint: apples-to-apples sibling row — the reference's
    # config has remat ON (BASELINE.md); the default row turns it off
    # because the v5e has the HBM headroom (and the fused sampled head
    # recomputes its forward anyway). PERF.md carries both numbers.
    remat = "--hybrid_checkpoint" in argv
    # --sorted_head_off: A/B escape hatch for the r5 sorted-head fast path
    sorted_head = "off" if "--sorted_head_off" in argv else "auto"
    from sgs_gnn_tpu.utils.compcache import enable as enable_compcache
    enable_compcache()
    import jax
    import jax.numpy as jnp
    from sgs_gnn_tpu.core import Config
    from sgs_gnn_tpu.models import get_model, init_params
    from sgs_gnn_tpu.train import DualOptimizer, make_train_step

    g = build_partition()
    q = 200_000  # metis_threshold 1M * sample_perc 0.2 (reference main.py:50)
    cfg = Config(pipeline="hybrid", mode="learned", conditional=True,
                 sparse_edge_mlp=True, reg1=True, reg2=True,
                 hybrid_checkpoint=remat, sorted_head=sorted_head,
                 nhid=256, dtype="bfloat16",
                 prng_impl="rbg", approx_topk=True)
    model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type, dtype=cfg.dtype)
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_train_step(cfg, model, opt, q, max_epoch=10)

    key = jax.random.key(1, impl=cfg.prng_impl)
    # warmup / compile; the float() readback forces real execution (remote
    # TPU tunnels dispatch asynchronously and block_until_ready may return
    # before queued work drains — a data-dependent host readback cannot)
    params, opt_state, m = step(params, opt_state, g, jnp.asarray(0),
                                jax.random.fold_in(key, 0))
    _ = float(m.loss)

    # measure bare dispatch+readback round-trip to subtract tunnel latency
    t0 = time.perf_counter()
    _ = float(m.loss) + float(m.temperature)
    roundtrip = time.perf_counter() - t0

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(1, n_iters + 1):
        params, opt_state, m = step(params, opt_state, g, jnp.asarray(i),
                                    jax.random.fold_in(key, i))
    # m.loss depends on the params chain through every step: reading it
    # back guarantees all n_iters steps executed
    final_loss = float(m.loss)
    dt = max(time.perf_counter() - t0 - roundtrip, 1e-9) / n_iters
    assert np.isfinite(final_loss), final_loss

    edges_per_s = g.num_edges / dt
    print(json.dumps({
        "metric": "hybrid_train_edges_per_s" + ("_remat" if remat else ""),
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / REFERENCE_EDGES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
