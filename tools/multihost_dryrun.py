"""Multi-host dryrun: run the partition-parallel (and halo) training path
under REAL process sharding — N CPU processes on localhost, Gloo
collectives — proving the same step that runs on a multi-host TPU pod
compiles and executes with jax.distributed.

Usage (each process):
    python tools/multihost_dryrun.py --process_id I --num_processes N \
        --coordinator localhost:PORT [--local_devices 2] [--halo]

Prints one final line ``DRYRUN_OK loss_first=... loss_last=...`` that
tests/test_multihost.py parses; asserts the loss is finite and decreased.
"""
import argparse
import os
import sys

p = argparse.ArgumentParser()
p.add_argument("--process_id", type=int, required=True)
p.add_argument("--num_processes", type=int, required=True)
p.add_argument("--coordinator", type=str, default="localhost:29517")
p.add_argument("--local_devices", type=int, default=2)
p.add_argument("--halo", action="store_true")
p.add_argument("--steps", type=int, default=8)
args = p.parse_args()

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").split(
        "--xla_force_host_platform_device_count")[0].strip()
    + f" --xla_force_host_platform_device_count={args.local_devices}").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sgs_gnn_tpu.parallel.distributed import init_distributed  # noqa: E402

init_distributed(args.coordinator, args.num_processes, args.process_id)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgs_gnn_tpu.core import Config  # noqa: E402
from sgs_gnn_tpu.data import (sbm_graph, to_undirected,  # noqa: E402
                              partition_nodes, induced_subgraphs)
from sgs_gnn_tpu.data.transforms import train_val_test_masks  # noqa: E402
from sgs_gnn_tpu.models import get_model, init_params  # noqa: E402
from sgs_gnn_tpu.train import DualOptimizer  # noqa: E402

n_dev = len(jax.devices())
assert n_dev == args.num_processes * args.local_devices, (
    f"{n_dev} != {args.num_processes} x {args.local_devices}")
assert jax.process_count() == args.num_processes

n = 64 * n_dev
x, ei, y, _ = sbm_graph(n=n, num_classes=3, deg=8, h=0.75, feat_dim=16,
                        seed=0)
ei = to_undirected(ei)
tr, va, te = train_val_test_masks(n)
# gate/regs off: the conditional gate where-selects between CE+regs and
# plain CE, so the reported loss is not comparable across steps — a clean
# hybrid CE trajectory makes the loss-decreases assertion meaningful
cfg = Config(pipeline="hybrid", mode="learned", nhid=16, donate=False,
             multihost=True, num_processes=args.num_processes,
             process_id=args.process_id, drop_rate=0.1,
             conditional=False, reg1=False, reg2=False,
             dataset="SyntheticSBM")

losses = []
if args.halo:
    from sgs_gnn_tpu.parallel import (make_global_mesh, build_halo_batch,
                                      shard_halo_batch, make_halo_train_step)
    mesh = make_global_mesh()
    part = partition_nodes(ei, n, n_dev)
    hb = build_halo_batch(x, ei, y, tr, va, te, None, n_dev, 3,
                          sample_perc=0.5, part=part)
    hb = shard_halo_batch(hb, mesh)
    model = get_model(cfg.GNN, x.shape[1], cfg.nhid, 3, cfg.drop_rate,
                      cfg.edge_mlp_type)
    params = init_params(model, jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(ei[0]), jnp.asarray(ei[1]))
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_halo_train_step(cfg, opt, args.steps, mesh)
    key = jax.random.PRNGKey(7)
    for i in range(args.steps):
        params, opt_state, m = step(params, opt_state, hb, jnp.asarray(i),
                                    jax.random.fold_in(key, i))
        losses.append(float(m.loss))
else:
    from sgs_gnn_tpu.parallel import (make_global_mesh,
                                      make_parallel_train_step,
                                      local_slot_indices,
                                      stack_local_to_global)
    mesh = make_global_mesh()
    part = partition_nodes(ei, n, n_dev)
    graphs = induced_subgraphs(x, ei, y, tr, va, te, part, n_dev)
    slots = local_slot_indices(mesh)
    gstack = stack_local_to_global([graphs[s] for s in slots], mesh)
    q = max(8, min(int(np.asarray(g.edge_mask).sum()) for g in graphs) // 2)
    g0 = graphs[0]
    model = get_model(cfg.GNN, x.shape[1], cfg.nhid, 3, cfg.drop_rate,
                      cfg.edge_mlp_type)
    params = init_params(model, jax.random.PRNGKey(0), g0.x, g0.senders,
                         g0.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_parallel_train_step(cfg, model, opt, q, args.steps, mesh)
    key = jax.random.PRNGKey(7)
    for i in range(args.steps):
        params, opt_state, m = step(params, opt_state, gstack,
                                    jnp.asarray(i),
                                    jax.random.fold_in(key, i))
        losses.append(float(m.loss))

assert all(np.isfinite(l) for l in losses), losses
assert losses[-1] < losses[0], losses
print(f"DRYRUN_OK mode={'halo' if args.halo else 'parallel'} "
      f"devices={n_dev} hosts={jax.process_count()} "
      f"loss_first={losses[0]:.6f} loss_last={losses[-1]:.6f}", flush=True)
