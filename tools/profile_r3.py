"""Round-3 ablation profile: isolate each fast path / loss term's cost."""
import os, sys, time
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

def step_time(name, cfg, g):
    model = get_model(cfg.GNN, g.x.shape[1], cfg.nhid, g.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type, dtype=cfg.dtype)
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_train_step(cfg, model, opt, Q, max_epoch=10)
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
    print(f"{name:58s} {dt*1e3:8.3f} ms", flush=True)
    return dt

def main():
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()}  iters={ITERS}", flush=True)
    g = build_partition()
    g_notile = g.replace(tile_ls=None, tile_lr=None, tile_su=None,
                         tile_rv=None, tile_perm=None, tile_prob=None,
                         tile_mask=None, tile_aux=None, tile_t=0, tile_b=0)
    base = dict(pipeline="hybrid", mode="learned", conditional=True,
                sparse_edge_mlp=True, reg1=True, reg2=True,
                hybrid_checkpoint=False, nhid=256, dtype="bfloat16",
                prng_impl="rbg", approx_topk=True, donate=False)
    if which in ("a", "all"):
        step_time("full step (bench config)", Config(**base), g)
        step_time("  - reg2 off only", Config(**{**base, "reg2": False}), g)
        step_time("  - reg1 off only", Config(**{**base, "reg1": False}), g)
    if which in ("b", "all"):
        os.environ["SGS_FUSED_HEAD"] = "off"
        step_time("  - fused sampled head off (XLA gather head)",
                  Config(**base), g)
        os.environ["SGS_FUSED_HEAD"] = "auto"
        step_time("  - dense_subgraph off", Config(**{**base,
                  "dense_subgraph": "off"}), g)
        step_time("  - tile index off", Config(**base), g_notile)
        step_time("  - sort sampled idx (banded-scatter probe)",
                  Config(**base), g)
main()
