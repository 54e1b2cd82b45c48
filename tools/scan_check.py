"""Dispatch-overhead cross-check: python-loop step timing vs in-jit scan.

PERF.md's component costs sum to ~5-6 ms less than the measured step; if an
in-jit `lax.scan` of the SAME step runs materially faster per step, the gap
is host->tunnel dispatch latency (actionable: scan supersteps in the
driver), otherwise it is real device compute (actionable: profile further).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sgs_gnn_tpu.utils.compcache import enable as _cc
_cc()
import numpy as np
import jax
import jax.numpy as jnp
from bench import build_partition
from sgs_gnn_tpu.core import Config
from sgs_gnn_tpu.models import get_model, init_params
from sgs_gnn_tpu.train import DualOptimizer, make_train_step

ITERS = 20
Q = 200_000


def main():
    print(f"backend={jax.default_backend()}", flush=True)
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

    # python loop (the bench methodology)
    p, s, m = step(params, opt_state, g, jnp.asarray(0),
                   jax.random.fold_in(key, 0))
    _ = float(m.loss)
    t0 = time.perf_counter()
    for i in range(1, ITERS + 1):
        p, s, m = step(p, s, g, jnp.asarray(i), jax.random.fold_in(key, i))
    _ = float(m.loss)
    t_loop = (time.perf_counter() - t0) / ITERS
    print(f"python-loop: {t_loop*1e3:8.3f} ms/step", flush=True)

    @jax.jit
    def scan_steps(p, s):
        def body(c, i):
            p_, s_ = c
            inner = getattr(step, "__wrapped__", step)
            p2, s2, m = inner(p_, s_, g, i, jax.random.fold_in(key, i))
            return (p2, s2), m.loss

        (p_f, s_f), losses = jax.lax.scan(body, (p, s),
                                          jnp.arange(ITERS, dtype=jnp.int32))
        return losses

    losses = scan_steps(params, opt_state)
    _ = np.asarray(losses)
    t0 = time.perf_counter()
    losses = scan_steps(params, opt_state)
    _ = np.asarray(losses)
    t_scan = (time.perf_counter() - t0) / ITERS
    print(f"in-jit scan: {t_scan*1e3:8.3f} ms/step "
          f"(dispatch overhead ~= {max(t_loop-t_scan,0)*1e3:.3f} ms/step)",
          flush=True)


main()
