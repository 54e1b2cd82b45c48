"""Tunnel-proof piece timings: each op runs N times inside ONE jitted
lax.scan (device-side chain, single dispatch+readback), so per-call remote
dispatch latency (~5 ms through the axon tunnel) cancels out."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from sgs_gnn_tpu.utils.compcache import enable as _cc
_cc()
import jax
import jax.numpy as jnp

N_ITER = 50


def scan_time(name, body, init_carry):
    """body(carry, i) -> carry; time N_ITER iterations in one jit."""
    @jax.jit
    def run(c0):
        def f(c, i):
            return body(c, i), ()
        c, _ = jax.lax.scan(f, c0, jnp.arange(N_ITER))
        return c
    c = run(init_carry)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(c)[0]))
    t0 = time.perf_counter()
    c = run(init_carry)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(c)[0]))
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"{name:58s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}  scan iters={N_ITER}",
          flush=True)
    from bench import build_partition
    g = build_partition()
    e, n = g.num_edges, g.num_nodes
    Q = 200_000
    rng = np.random.default_rng(0)
    probs0 = jnp.asarray(rng.random(e), jnp.float32)
    key0 = jax.random.key(2, impl="rbg")

    from sgs_gnn_tpu.ops.sampling_ops import gumbel_topk

    def mk_topk():
        def body(c, i):
            k = jax.random.fold_in(key0, i)
            idx = gumbel_topk(k, probs0 + 1e-12 * c, Q, approx=True)
            return jnp.sum(idx.astype(jnp.float32)) * 1e-12
        return body

    os.environ["SGS_TOPK_BF16"] = "off"
    scan_time("gumbel+approx_max_k f32 keys (1M)", mk_topk(), jnp.zeros(()))
    os.environ["SGS_TOPK_BF16"] = "on"
    scan_time("gumbel+approx_max_k bf16 keys (1M)", mk_topk(), jnp.zeros(()))

    idx0 = jnp.asarray(rng.integers(0, e, Q), jnp.int32)

    def aux_body(c, i):
        aux = g.edge_aux[(idx0 + i) % e]
        return jnp.sum(aux[:, 2].astype(jnp.float32)) * 1e-12 + c * 0

    scan_time("packed edge-aux gather (q rows of (E,3) int32)", aux_body,
              jnp.zeros(()))

    nodes0 = jnp.asarray(rng.integers(0, n, Q), jnp.int32)
    tab0 = jnp.asarray(rng.normal(size=(n, 41)), jnp.float32)
    from sgs_gnn_tpu.ops.edge_gather import gather_rows

    def mk_reg2(fn):
        gradf = jax.grad(
            lambda t, nd: jnp.sum(fn(t, nd) * fn(t, nd[::-1])))

        def body(c, i):
            gt = gradf(tab0 + c * 1e-12, (nodes0 + i) % n)
            return jnp.sum(gt) * 1e-12
        return body

    scan_time("reg2-ish gathers fwd+bwd: DMA gather_rows",
              mk_reg2(gather_rows), jnp.zeros(()))

    from sgs_gnn_tpu.ops.dense_graph import dense_adj

    def dense_body(c, i):
        a = dense_adj(g.senders[:Q], (g.receivers[:Q] + i) % n, n).adj
        return jnp.sum(a) * 1e-12 + c * 0

    scan_time("dense adjacency build (q edges -> (N,N))", dense_body,
              jnp.zeros(()))

    from sgs_gnn_tpu.core import Config
    from sgs_gnn_tpu.models import get_model, init_params
    from sgs_gnn_tpu.train import DualOptimizer
    cfg = Config(pipeline="hybrid", mode="learned", nhid=256,
                 dtype="bfloat16", prng_impl="rbg", donate=False)
    model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type, dtype=cfg.dtype)
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)

    def opt_body(carry, i):
        p, s = carry
        grads = jax.tree_util.tree_map(
            lambda l: jnp.full_like(l, 1e-8), p)
        p2, s2 = opt.step_learned(p, grads, s, jnp.asarray(True))
        return (p2, s2)

    scan_time("dual-optimizer step_learned alone",
              opt_body, (params, opt.init(params)))


if __name__ == "__main__":
    main()
