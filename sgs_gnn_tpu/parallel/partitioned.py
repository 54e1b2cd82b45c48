"""Partition-parallel training: cluster batches sharded over a device mesh.

The reference iterates METIS cluster batches SEQUENTIALLY on one GPU with an
optimizer step per batch (reference main.py:57-67, training_hybrid.py:29).
Here the same batches become shards over the mesh's ``data`` axis: every
device runs the full learned-mode loss on its own partition (identical
numerics to one reference batch), gradients are averaged with ``psum``
over ICI, and ONE synchronized dual-Adam update is applied per super-step.

This is the documented superset mode (SURVEY.md section 2.5): N sequential
reference steps with lr @ batch-size-1 become one data-parallel step over N
partitions — same graph semantics per partition (inter-cluster edges
dropped), different (synchronous-SGD) update schedule. The conditional
gate stays per-partition: each shard's edge-scorer gradients are zeroed by
its own gate before the psum, and the edge group steps if ANY shard's gate
passed (pmax).
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..core.config import Config
from ..core.graph import Graph
from ..sparsify.sampling import temperature_at
from ..train.optim import DualOptimizer
from ..train.pipelines import make_learned_loss, StepMetrics
from ..train.losses import micro_f1
from ..eval.evaluate import make_eval_step


def stack_batches(graphs: List[Graph]) -> Graph:
    """Stack equal-shape partition Graphs along a new leading axis, ready to
    shard over the ``data`` mesh axis. Requires padded batches (all shapes
    equal — data/partition.py pad=True guarantees this)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *graphs)


def shard_batches(stacked: Graph, mesh: Mesh) -> Graph:
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), stacked)


def make_parallel_train_step(cfg: Config, model, opt: DualOptimizer, q: int,
                             max_epoch: int, mesh: Mesh):
    """Build the shard_map'd multi-chip train step.

    Signature: step(params, opt_state, stacked_graphs, epoch, key)
               -> (params, opt_state, StepMetrics)
    params/opt_state replicated; stacked_graphs sharded on axis 0 with one
    partition per device.
    """
    if cfg.mode != "learned":
        return _make_parallel_baseline_step(cfg, model, opt, q, max_epoch,
                                            mesh)
    loss_fn = make_learned_loss(cfg, model, q)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P("data"), P(), P()),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def step(params, opt_state, gstack, epoch, key):
        # local shard has leading dim 1: one partition per device
        g = jax.tree_util.tree_map(lambda a: a[0], gstack)
        my = jax.lax.axis_index("data")
        local_key = jax.random.fold_in(key, my)
        (loss, (gate, lf1, rf1)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, g, local_key)
        # per-partition gate masks that shard's edge-scorer contribution;
        # grads for the selected branch are already in `grads` (the loss
        # where-selects per partition)
        gate_f = gate.astype(jnp.float32)

        def mask_edge(path, leaf):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if "edge_prob_mlp" in name:
                return leaf * gate_f
            return leaf
        grads = jax.tree_util.tree_map_with_path(mask_edge, grads)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        lf1 = jax.lax.pmean(lf1, "data")
        rf1 = jax.lax.pmean(rf1, "data")
        any_gate = jax.lax.pmax(gate.astype(jnp.int32), "data") > 0
        params2, opt_state2 = opt.step_learned(params, grads, opt_state,
                                               any_gate)
        t = temperature_at(epoch, max_epoch, cfg.t_init, cfg.t_min)
        metrics = StepMetrics(loss, t, any_gate.astype(jnp.float32), lf1, rf1)
        return params2, opt_state2, metrics

    return jax.jit(step)


def _make_parallel_baseline_step(cfg: Config, model, opt: DualOptimizer,
                                 q: int, max_epoch: int, mesh: Mesh):
    """Baseline modes (random/edge/full) over the mesh: each shard runs the
    single-forward CE loss on its own partition (reference
    training_hybrid.py:149-180), gradients pmean'd, one synchronized
    third-optimizer (weight-decay Adam) update per super-step."""
    from ..train.pipelines import make_baseline_loss
    loss_fn = make_baseline_loss(cfg, model, q)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P("data"), P(), P()),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def step(params, opt_state, gstack, epoch, key):
        g = jax.tree_util.tree_map(lambda a: a[0], gstack)
        my = jax.lax.axis_index("data")
        local_key = jax.random.fold_in(key, my)
        loss, grads = jax.value_and_grad(loss_fn)(params, g, local_key)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        params2, opt_state2 = opt.step_all(params, grads, opt_state)
        t = temperature_at(epoch, max_epoch, cfg.t_init, cfg.t_min)
        zero = jnp.zeros(())
        metrics = StepMetrics(loss, t, zero, zero, zero)
        return params2, opt_state2, metrics

    return jax.jit(step)


def make_parallel_eval_step(cfg: Config, model, q: int, mesh: Mesh):
    """Ensemble eval over sharded partitions: each device evaluates its own
    partition, weighted-F1 sums psum'd across the mesh."""
    inner = make_eval_step(cfg, model, q)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P("data"), P(), P()),
             out_specs=P(), check_vma=False)
    def step(params, gstack, key, temperature):
        g = jax.tree_util.tree_map(lambda a: a[0], gstack)
        my = jax.lax.axis_index("data")
        res = inner(params, g, jax.random.fold_in(key, my), temperature)
        return {k: jax.lax.psum(v, "data") for k, v in res.items()}

    return jax.jit(step)
