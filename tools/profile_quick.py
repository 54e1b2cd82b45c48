"""Quick hybrid-step attribution: ONE full-step timing + isolated sub-ops.

Trimmed version of profile_step.py (which compiles five full-step variants
and can exceed the driver's command timeout through the TPU tunnel).
Unbuffered prints so progress is visible line by line.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_partition
from sgs_gnn_tpu.core import Config
from sgs_gnn_tpu.models import get_model, init_params
from sgs_gnn_tpu.train import DualOptimizer, make_train_step

print = functools.partial(print, flush=True)

ITERS = 20
Q = 200_000


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(carry, _):
            out = fn(*jax.tree_util.tree_map(
                lambda a: (a + carry * 0).astype(a.dtype)
                if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating)
                else a, args))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.float32(leaf.reshape(-1)[0]) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    carry = loop(args)
    _ = float(carry)
    t0 = time.perf_counter()
    carry = loop(args)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:58s} {dt*1e3:8.3f} ms")
    return dt


def main():
    print(f"backend={jax.default_backend()}  iters={ITERS}")
    g = build_partition()
    cfg = Config(pipeline="hybrid", mode="learned", conditional=True,
                 sparse_edge_mlp=True, reg1=True, reg2=True,
                 hybrid_checkpoint=False, nhid=256, dtype="bfloat16",
                 prng_impl="rbg", approx_topk=True, donate=False)
    model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type, dtype=cfg.dtype)
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_train_step(cfg, model, opt, Q, max_epoch=10)
    key = jax.random.key(1, impl=cfg.prng_impl)
    params2, opt_state2, m = step(params, opt_state, g, jnp.asarray(0),
                                  jax.random.fold_in(key, 0))
    _ = float(m.loss)
    t0 = time.perf_counter()
    for i in range(1, ITERS + 1):
        params2, opt_state2, m = step(params2, opt_state2, g, jnp.asarray(i),
                                      jax.random.fold_in(key, i))
    _ = float(m.loss)
    print(f"{'full step (bench config)':58s} "
          f"{(time.perf_counter()-t0)/ITERS*1e3:8.3f} ms")

    key = jax.random.PRNGKey(7)
    from sgs_gnn_tpu.sparsify import sample_edges, sample_prior_edges

    rand_idx = sample_prior_edges(key, g.prob, Q, g.edge_mask, approx=True)
    rs, rr = g.senders[rand_idx], g.receivers[rand_idx]

    def prior_sample(p_):
        return sample_prior_edges(key, p_, Q, g.edge_mask,
                                  approx=True).astype(jnp.float32)

    timeit("sample_prior_edges (1M -> 200k)", prior_sample, g.prob)

    def gather_ei(i_f):
        i = i_f.astype(jnp.int32)
        return (g.senders[i] + g.receivers[i]).astype(jnp.float32)

    timeit("edge-index gathers (2 x 200k int32)", gather_ei,
           rand_idx.astype(jnp.float32))

    def encode(x):
        return model.apply(params, x, rs, rr, False,
                           rngs={"dropout": key}, method="encode_scorer")

    h = encode(g.x)
    timeit("encode (scorer GCN on 200k rand edges)", encode, g.x)

    def score_full(h):
        return model.apply(params, h, g.senders, g.receivers, False,
                           rngs={"dropout": key},
                           method="score_from_embeddings")

    probs = score_full(h)
    timeit("score_from full 1M edges (fwd only)", score_full, h)

    def sample(p_):
        idx, _ = sample_edges(key, p_, g.prob, Q, 0.3, edge_mask=g.edge_mask,
                              approx=True)
        return idx.astype(jnp.float32)

    timeit("sample_edges approx top-k (1M -> 200k)", sample, probs)

    idx, _ = sample_edges(key, probs, g.prob, Q, 0.3, edge_mask=g.edge_mask,
                          approx=True)
    ss, sr = g.senders[idx], g.receivers[idx]

    def head_grad(h):
        def loss(h_):
            w = model.apply(params, h_, ss, sr, False,
                            rngs={"dropout": key},
                            method="score_from_embeddings")
            return jnp.sum(w)
        return jax.grad(loss)(h)

    timeit("score head fwd+bwd on 200k sampled edges (d h)", head_grad, h)

    def gnn_grad(x):
        def loss(p):
            out = model.apply(p, x, ss, sr, jnp.ones(Q, jnp.float32), False,
                              rngs={"dropout": key})
            return jnp.sum(out)
        return jax.grad(loss)(params)

    timeit("GNN fwd+bwd on 200k sampled edges (d params)", gnn_grad, g.x)

    def gnn_fwd(x):
        return model.apply(params, x, rs, rr, None, False,
                           rngs={"dropout": key})

    timeit("gate GNN fwd on 200k rand edges", gnn_fwd, g.x)

    def opt_step(p):
        grads = jax.tree_util.tree_map(jnp.ones_like, p)
        p2, _ = opt.step_learned(p, grads, opt_state, jnp.asarray(True))
        return p2

    timeit("dual-Adam update (gated)", opt_step, params)


if __name__ == "__main__":
    main()
