"""Round-4 profile: name the '~3 ms leftovers' bucket and A/B the r4 levers.

Pieces timed stand-alone on the bench partition (same methodology as
profile_r3: 20 param-chained iterations, data-dependent readback closes the
timing window):
  * sampling keys + approx_max_k (f32 vs bf16 keys)
  * packed edge-aux gather at q rows
  * reg2 endpoint gathers (DMA fwd + MXU scatter bwd)
  * dual-optimizer update alone
  * dense adjacency build
  * full step A/Bs: SGS_TOPK_BF16 on/off, tile t/b retune
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from sgs_gnn_tpu.utils.compcache import enable as _cc
_cc()
import jax
import jax.numpy as jnp

from bench import build_partition
from sgs_gnn_tpu.core import Config
from sgs_gnn_tpu.models import get_model, init_params
from sgs_gnn_tpu.train import DualOptimizer, make_train_step

ITERS = 20
Q = 200_000


def timeit(name, fn, *args):
    out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.device_get(first)).reshape(-1)[:1]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.device_get(first)).reshape(-1)[:1]
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:58s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def step_time(name, cfg, g, q=Q):
    model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type, dtype=cfg.dtype)
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_train_step(cfg, model, opt, q, max_epoch=10)
    key = jax.random.key(1, impl=cfg.prng_impl)
    params, opt_state, m = step(params, opt_state, g, jnp.asarray(0),
                                jax.random.fold_in(key, 0))
    _ = float(m.loss)
    t0 = time.perf_counter()
    for i in range(1, ITERS + 1):
        params, opt_state, m = step(params, opt_state, g, jnp.asarray(i),
                                    jax.random.fold_in(key, i))
    _ = float(m.loss)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:58s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()}  iters={ITERS}", flush=True)
    g = build_partition()
    base = dict(pipeline="hybrid", mode="learned", conditional=True,
                sparse_edge_mlp=True, reg1=True, reg2=True,
                hybrid_checkpoint=False, nhid=256, dtype="bfloat16",
                prng_impl="rbg", approx_topk=True, donate=False)

    if which in ("pieces", "all"):
        e = g.num_edges
        n = g.num_nodes
        probs = jnp.asarray(np.random.default_rng(0).random(e), jnp.float32)
        key = jax.random.key(2, impl="rbg")

        from sgs_gnn_tpu.ops.sampling_ops import gumbel_topk
        os.environ["SGS_TOPK_BF16"] = "off"
        f_f32 = jax.jit(lambda k, p: gumbel_topk(k, p, Q, approx=True))
        timeit("gumbel+approx_max_k f32 keys (1M)", f_f32, key, probs)
        os.environ["SGS_TOPK_BF16"] = "on"
        f_bf16 = jax.jit(lambda k, p: gumbel_topk(k, p, Q, approx=True))
        timeit("gumbel+approx_max_k bf16 keys (1M)", f_bf16, key, probs)

        idx = jnp.asarray(
            np.random.default_rng(1).integers(0, e, Q), jnp.int32)
        if g.edge_aux is not None:
            timeit("packed edge-aux gather (q rows of (E,4) int32)",
                   jax.jit(lambda i: g.edge_aux[i]), idx)

        nodes = jnp.asarray(
            np.random.default_rng(2).integers(0, n, Q), jnp.int32)
        out_tab = jnp.asarray(
            np.random.default_rng(3).normal(size=(n, 41)), jnp.float32)
        from sgs_gnn_tpu.ops.edge_gather import gather_rows

        def reg2ish(fn, tab):
            a = fn(tab, nodes)
            b = fn(tab, nodes[::-1])
            return jnp.sum(a * b)

        timeit("reg2 endpoint gathers fwd+bwd: DMA gather_rows",
               jax.jit(jax.grad(lambda t: reg2ish(gather_rows, t))), out_tab)

        from sgs_gnn_tpu.ops.dense_graph import dense_adj
        timeit("dense adjacency build (q edges -> (N,N))",
               jax.jit(lambda s, r: dense_adj(s, r, n).adj),
               g.senders[:Q], g.receivers[:Q])

        cfg = Config(**base)
        model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                          cfg.drop_rate, cfg.edge_mlp_type, dtype=cfg.dtype)
        params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                             g.receivers)
        opt = DualOptimizer.create(params, cfg.GNN, cfg.lr,
                                   cfg.weight_decay)
        opt_state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        timeit("dual-optimizer step_learned alone",
               jax.jit(lambda p, s: opt.step_learned(p, grads, s,
                                                     jnp.asarray(True))),
               params, opt_state)

    if which in ("ab", "all"):
        os.environ["SGS_TOPK_BF16"] = "off"
        step_time("full step, f32 topk keys", Config(**base), g)
        os.environ["SGS_TOPK_BF16"] = "on"
        step_time("full step, bf16 topk keys", Config(**base), g)

    if which in ("tile", "all"):
        # rebuild the same partition data with retuned tile layouts
        from sgs_gnn_tpu.core import Graph
        from sgs_gnn_tpu.data import degree_prior
        rngg = np.random.default_rng(0)
        nn, ne = 2048, 1_000_000
        w = rngg.pareto(1.5, nn) + 1.0
        p = w / w.sum()
        s = rngg.choice(nn, ne, p=p).astype(np.int32)
        r = rngg.choice(nn, ne, p=p).astype(np.int32)
        xx = rngg.normal(size=(nn, 602)).astype(np.float32)
        yy = rngg.integers(0, 41, nn).astype(np.int32)
        tr = rngg.random(nn) < 0.66
        prob = degree_prior(s, r, nn)
        for t, b in [(256, 1024), (128, 512), (128, 1024), (64, 512),
                     (64, 256)]:
            g2 = Graph.build(xx, np.stack([s, r]), yy, tr, ~tr,
                             np.zeros(nn, bool), prob=prob, num_classes=41,
                             sort_by_receiver=True, tile_index=True,
                             tile_t=t, tile_b=b)
            if g2.tile_t == 0:
                print(f"tile t={t} b={b}: layout declined", flush=True)
                continue
            slots = g2.tile_ls.shape[0] / g2.num_edges
            step_time(f"full step, tile t={t} b={b} (slots {slots:.2f}x)",
                      Config(**base), g2)


def ablations():
    g = build_partition()
    base = dict(pipeline="hybrid", mode="learned", conditional=True,
                sparse_edge_mlp=True, reg1=True, reg2=True,
                hybrid_checkpoint=False, nhid=256, dtype="bfloat16",
                prng_impl="rbg", approx_topk=True, donate=False)
    step_time("full step (bench config)", Config(**base), g)
    step_time("  - drop_rate=0 (no dropout PRNG/masks)",
              Config(**{**base, "drop_rate": 0.0}), g)
    step_time("  - reg2 off", Config(**{**base, "reg2": False}), g)
    step_time("  - reg1 off", Config(**{**base, "reg1": False}), g)
    step_time("  - conditional off (no gate fwd, no 2x f1)",
              Config(**{**base, "conditional": False}), g)
    step_time("  - conditional+sparse_edge_mlp off (no rand subgraph)",
              Config(**{**base, "conditional": False,
                        "sparse_edge_mlp": False}), g)
    step_time("  - eval-free lower bound: all of the above off",
              Config(**{**base, "drop_rate": 0.0, "reg2": False,
                        "reg1": False, "conditional": False,
                        "sparse_edge_mlp": False}), g)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ablate":
        print(f"backend={jax.default_backend()}  iters={ITERS}", flush=True)
        ablations()
    else:
        main()
