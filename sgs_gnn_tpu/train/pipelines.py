"""Training pipelines as jitted step functions.

One compiled step = one cluster-partition batch of the reference's training
loop (reference training_{two_pass,straight_through,hybrid}.py). All three
pipelines share the tail (conditional gate, reg1/reg2, dual-optimizer
update); they differ only in how edge probabilities reach the GNN:

  two_pass          score full graph w/o grad -> sample -> RE-score the
                    sampled edges with grad (training_two_pass.py:48-80)
  straight_through  one grad-enabled scoring pass; the sampler's
                    straight-through weights feed the GNN so gradients flow
                    through the sampling distribution
                    (training_straight_through.py:49-75)
  hybrid            one grad-enabled scoring pass (optionally rematerialized,
                    = --hybrid_checkpoint); sample on detached probs; reuse
                    the same tensor's sampled entries as weights
                    (training_hybrid.py:51-88)

The reference's data-dependent control flow becomes jit-friendly selection:
the conditional gate computes both branch losses and selects with
``jnp.where`` on a stop-gradiented predicate, and the optimizer applies
where-masked state updates (see train/optim.py). Decisions that are static
(mode, pipeline, flags, E vs q) stay Python-level so XLA never sees them.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import Config
from ..core.graph import Graph
from ..ops.dense_graph import dense_adj, use_dense_subgraph
from ..sparsify.sampling import (sample_edges, sample_prior_edges,
                                 random_edges, temperature_at)
from .losses import (masked_cross_entropy, micro_f1, assortative_bce,
                     assortative_bce_flags, consistency_loss)
from .optim import DualOptimizer


class StepMetrics(NamedTuple):
    loss: jax.Array
    temperature: jax.Array
    conditional_update: jax.Array  # 1.0 if the edge scorer was updated
    learned_f1: jax.Array
    random_f1: jax.Array


def _apply_gnn(model, params, x, s, r, w, key):
    return model.apply(params, x, s, r, w, deterministic=False,
                       rngs={"dropout": key})


def _score(model, params, x, prop_s, prop_r, score_s, score_r, key,
           use_remat=False, band=0, sorted_side=""):
    # band: static narrow-band bound when score_r is the full
    # sorted-by-receiver edge list (Graph.receiver_band) — routes the
    # backward dh scatter through the banded Pallas kernel.
    # sorted_side: the sampled-index sort declaration for the fused head
    # (ops/score_sampled.py sorted-head fast path)
    return model.apply(params, x, prop_s, prop_r, score_s, score_r,
                       False, use_remat, band, sorted_side,
                       rngs={"dropout": key}, method="score_edges")


def make_learned_loss(cfg: Config, model, q: int):
    """Factory for the learned-mode differentiable loss of one batch.

    Returns ``loss_fn(params, g, key) -> (total_loss, (gate, lf1, rf1))``
    shared by the single-chip step and the partition-parallel shard_map step
    (parallel/partitioned.py). All pipeline-specific edge-probability
    plumbing lives here; see the module docstring for the three variants.
    """
    pipeline = cfg.pipeline

    def loss_fn(p, g: Graph, key):
        k_rand, k_sample, k_s1, k_s2, k_g1, k_g2 = jax.random.split(key, 6)
        n = g.num_nodes
        sel_valid = None   # set by branches that sample in a permuted space
        reg1_flags = None  # static edge flags riding the packed aux gather
        use_rand = cfg.conditional or cfg.sparse_edge_mlp
        # densify per-step subgraphs? (ops/dense_graph.py: for small-N
        # partitions all message passing becomes dense MXU matmuls)
        dense = use_dense_subgraph(cfg, n, q) and use_rand
        if use_rand:
            # degree-prior random subgraph, used for the conditional gate's
            # comparison forward AND as the scorer's propagation graph
            # (reference training_hybrid.py:45-57: random_sampled_edge_index
            # is passed to edge_prob_mlp whenever conditional or
            # sparse_edge_mlp is on)
            rand_idx = sample_prior_edges(k_rand, g.prob, q, g.edge_mask,
                                          approx=cfg.approx_topk, bf16=cfg.topk_bf16)
            if g.edge_aux is not None:
                aux_r = g.edge_aux[rand_idx]      # one packed row gather
                rand_s, rand_r = aux_r[:, 0], aux_r[:, 1]
                rand_valid = (aux_r[:, 2] & 4) > 0
            else:
                rand_s = g.senders[rand_idx]
                rand_r = g.receivers[rand_idx]
                rand_valid = g.edge_mask[rand_idx]
            if dense:
                a_rand = dense_adj(rand_s, rand_r, n, valid=rand_valid)
                rand_s, rand_r = a_rand, None
            prop_s, prop_r = rand_s, rand_r
        else:
            rand_s = rand_r = None
            prop_s, prop_r = g.senders, g.receivers

        def select_edges(idx):
            """Edge-order selection -> (s, r, valid, reg1 flags), one packed
            aux-row gather when the table exists."""
            if g.edge_aux is not None:
                aux = g.edge_aux[idx]
                return (aux[:, 0], aux[:, 1], (aux[:, 2] & 4) > 0, aux[:, 2])
            return (g.senders[idx], g.receivers[idx], g.edge_mask[idx], None)

        if pipeline == "two_pass":
            # pass 1 (no grad) on the full edge set
            probs_full = jax.lax.stop_gradient(_score(
                model, p, g.x, prop_s, prop_r, g.senders, g.receivers, k_s1))
            # (no-grad pass: band irrelevant, no backward scatter)
            idx, _ = sample_edges(k_sample, probs_full, g.prob, q,
                                  cfg.degree_bias_coef, edge_mask=g.edge_mask,
                                  approx=cfg.approx_topk, bf16=cfg.topk_bf16)
            sorted_side = ""
            if cfg.sorted_head != "off" and g.receiver_band > 0:
                # r5 sorted-head fast path (same as hybrid_rescore below):
                # ascending edge ids over the receiver-sorted edge list
                # sort the sampled receivers, so the grad-enabled re-score
                # head runs banded one-hot ops
                idx = jnp.sort(idx)
                sorted_side = "receivers"
            s_s, s_r, sel_valid, reg1_flags = select_edges(idx)
            # pass 3: grad-enabled re-score of only the sampled edges; the
            # scorer's encoder propagates on the sampled subgraph
            # (training_two_pass.py:75-77 passes sampled_edge_index as the
            # graph)
            if dense:
                a_samp = dense_adj(s_s, s_r, n)  # unweighted prop structure
                weights = _score(model, p, g.x, a_samp, None, s_s, s_r, k_s2,
                                 sorted_side=sorted_side)
            else:
                weights = _score(model, p, g.x, s_s, s_r, s_s, s_r, k_s2,
                                 sorted_side=sorted_side)
            probs_for_loss = weights
        elif pipeline == "straight_through":
            probs_full = _score(model, p, g.x, prop_s, prop_r,
                                g.senders, g.receivers, k_s1,
                                band=g.receiver_band)
            idx, weights = sample_edges(k_sample, probs_full, g.prob, q,
                                        cfg.degree_bias_coef,
                                        edge_mask=g.edge_mask,
                                        approx=cfg.approx_topk, bf16=cfg.topk_bf16)
            s_s, s_r, sel_valid, reg1_flags = select_edges(idx)
            probs_for_loss = weights
        elif pipeline == "hybrid" and cfg.hybrid_rescore:
            # TPU-first variant (cfg.hybrid_rescore): grads only ever reach
            # the scorer through probs_full[idx] (training_hybrid.py:86), so
            # run the full-E scoring pass detached (sampling only) and the
            # grad-enabled head on just the q sampled edges — q/E of the
            # backward cost, same gradient structure. Only the head's
            # dropout noise decouples between sampling and weights.
            h = model.apply(p, g.x, prop_s, prop_r, False,
                            rngs={"dropout": k_s1}, method="encode_scorer")
            if g.tile_t and h.shape[-1] <= 512:
                # fused tile-pair kernel: scores in TILE order, sampling in
                # tile space, only the q winners are mapped back
                # (ops/score_tiles.py)
                seed = jax.random.randint(k_s1, (), 0,
                                          jnp.iinfo(jnp.int32).max)
                probs_tiles = model.apply(
                    p, jax.lax.stop_gradient(h), g.tile_ls, g.tile_lr,
                    g.tile_su, g.tile_rv, g.tile_t, g.tile_b, False, seed,
                    method="score_tiles_from_embeddings")
                idx_t, _ = sample_edges(k_sample, probs_tiles, g.tile_prob,
                                        q, cfg.degree_bias_coef,
                                        edge_mask=g.tile_mask,
                                        approx=cfg.approx_topk, bf16=cfg.topk_bf16)
                sorted_side = ""
                if cfg.sorted_head != "off":
                    # r5 sorted-head fast path: ascending tile indices put
                    # the SENDERS in near-sorted order (the tile layout is
                    # sender-tile-major, ops/score_tiles.build_tile_index),
                    # so the fused head's sid-side one-hot ops run banded
                    # (ops/score_sampled.py). Sampling is a set — the
                    # reorder is consistent across every consumer below.
                    idx_t = jnp.sort(idx_t)
                    sorted_side = "senders"
                if g.tile_aux is not None:
                    # one packed tile-order aux gather replaces the
                    # tile_perm->senders/receivers/tile_mask gather chain;
                    # validity must come from TILE space (bit 2 of the tile
                    # aux flags): padding slots map to edge id 0, whose
                    # edge_mask may be True
                    aux = g.tile_aux[idx_t]
                    s_s, s_r = aux[:, 0], aux[:, 1]
                    sel_valid = (aux[:, 2] & 4) > 0
                    reg1_flags = aux[:, 2]
                else:
                    idx = g.tile_perm[idx_t]
                    sel_valid = g.tile_mask[idx_t]
                    s_s, s_r = g.senders[idx], g.receivers[idx]
            else:
                probs_sample = jax.lax.stop_gradient(model.apply(
                    p, jax.lax.stop_gradient(h), g.senders, g.receivers,
                    False, rngs={"dropout": k_s1},
                    method="score_from_embeddings"))
                idx, _ = sample_edges(k_sample, probs_sample, g.prob, q,
                                      cfg.degree_bias_coef,
                                      edge_mask=g.edge_mask,
                                      approx=cfg.approx_topk, bf16=cfg.topk_bf16)
                sorted_side = ""
                if cfg.sorted_head != "off" and g.receiver_band > 0:
                    # the edge list is receiver-sorted (core/graph.py), so
                    # ascending edge ids sort the sampled RECEIVERS exactly
                    idx = jnp.sort(idx)
                    sorted_side = "receivers"
                s_s, s_r, sel_valid, reg1_flags = select_edges(idx)
            weights = model.apply(p, h, s_s, s_r, False,
                                  cfg.hybrid_checkpoint, 0,
                                  rngs={"dropout": k_s2},
                                  method="score_from_embeddings",
                                  sorted_side=sorted_side)
            probs_for_loss = weights
        elif pipeline == "hybrid":
            probs_full = _score(model, p, g.x, prop_s, prop_r,
                                g.senders, g.receivers, k_s1,
                                use_remat=cfg.hybrid_checkpoint,
                                band=g.receiver_band)
            idx, _ = sample_edges(
                k_sample, jax.lax.stop_gradient(probs_full), g.prob, q,
                cfg.degree_bias_coef, edge_mask=g.edge_mask,
                approx=cfg.approx_topk, bf16=cfg.topk_bf16)
            s_s, s_r, sel_valid, reg1_flags = select_edges(idx)
            # hybrid's trick: differentiable weights are a gather of the
            # SAME tensor used for sampling (training_hybrid.py:86)
            weights = probs_full[idx]
            probs_for_loss = weights
        else:
            raise ValueError(pipeline)

        # Shards with fewer valid edges than q (padded cluster partitions,
        # parallel path) select padding edges last (-inf Gumbel keys). Those
        # are ghost-node self-loops, harmless to aggregation/CE/reg1, but
        # their weights and reg2 contribution must be zeroed. When valid >= q
        # sel_valid is all-True and this is the identity.
        if sel_valid is None:
            sel_valid = g.edge_mask[idx]
        weights = jnp.where(sel_valid, weights, 0.0)
        probs_for_loss = jnp.where(sel_valid, probs_for_loss, 0.0)

        learned_out = _apply_gnn(model, p, g.x, s_s, s_r, weights, k_g1)
        loss = masked_cross_entropy(learned_out, g.y, g.train_mask)
        if cfg.reg1:
            if reg1_flags is not None:
                # packed path: the static edge labels rode the one aux-row
                # gather already paid by select_edges / the tile aux table —
                # no per-step y/train_mask gathers (parity test:
                # tests/test_train.py::test_reg1_flags_matches_gather_form)
                loss = loss + cfg.regularizer1_coef * assortative_bce_flags(
                    probs_for_loss, reg1_flags)
            else:
                loss = loss + cfg.regularizer1_coef * assortative_bce(
                    probs_for_loss, s_s, s_r, g.y, g.train_mask)
        if cfg.reg2:
            loss = loss + cfg.consist_reg_coef * consistency_loss(
                probs_for_loss, s_s, s_r, learned_out, valid=sel_valid)

        if cfg.conditional:
            random_out = _apply_gnn(model, p, g.x, rand_s, rand_r, None, k_g2)
            lf1 = micro_f1(learned_out, g.y, g.train_mask)
            rf1 = micro_f1(random_out, g.y, g.train_mask)
            gate = jax.lax.stop_gradient(lf1 > rf1)
            loss_random = masked_cross_entropy(random_out, g.y, g.train_mask)
            total = jnp.where(gate, loss, loss_random)
        else:
            gate = jnp.asarray(True)
            lf1 = rf1 = jnp.zeros(())
            total = loss
        return total, (gate, lf1, rf1)

    return loss_fn


def make_baseline_loss(cfg: Config, model, q: int,
                       force_small: bool = False):
    """Factory for the baseline-mode (random/edge/full) loss of one batch:
    single forward on a (possibly sampled) subgraph + CE
    (reference training_hybrid.py:149-180). Shared by the single-chip
    baseline step and the partition-parallel shard_map step."""
    mode = cfg.mode

    def loss_fn(p, g: Graph, key):
        e = g.num_edges
        k_sel, k_drop = jax.random.split(key)
        if mode == "full" or force_small or e <= q:
            s_s, s_r = g.senders, g.receivers
        elif mode == "random":
            idx = random_edges(k_sel, e, q, edge_mask=g.edge_mask,
                               approx=cfg.approx_topk, bf16=cfg.topk_bf16)
            s_s, s_r = g.senders[idx], g.receivers[idx]
        elif mode == "edge":
            idx = sample_prior_edges(k_sel, g.prob, q, edge_mask=g.edge_mask,
                                     approx=cfg.approx_topk, bf16=cfg.topk_bf16)
            s_s, s_r = g.senders[idx], g.receivers[idx]
        else:
            raise ValueError(mode)
        out = _apply_gnn(model, p, g.x, s_s, s_r, None, k_drop)
        return masked_cross_entropy(out, g.y, g.train_mask)

    return loss_fn


def make_train_step(cfg: Config, model, opt: DualOptimizer, q: int,
                    max_epoch: int, force_small: bool = False):
    """Build the jitted per-batch train step for cfg.{mode,pipeline}.

    Returned signature:
        step(params, opt_state, graph, epoch, key)
            -> (params, opt_state, StepMetrics)
    The E<=q decision is made at trace time from the graph's static edge
    count (reference training_hybrid.py:41), so padded partitions of equal
    shape share one executable. For padded cluster batches the static edge
    count is the padded maximum; the driver passes ``force_small=True`` to
    compile the full-graph path for batches whose VALID edge count is <= q
    (the reference's dynamic per-batch decision, made on host).
    """
    mode = cfg.mode
    learned_loss = make_learned_loss(cfg, model, q) if mode == "learned" \
        else None

    def learned_step(params, opt_state, g: Graph, epoch, key):
        e = g.num_edges
        if force_small or e <= q:
            # small-batch path: full graph, CE only, gnn optimizer only
            # (reference training_hybrid.py:142-147)
            def loss_fn(p):
                out = _apply_gnn(model, p, g.x, g.senders, g.receivers,
                                 None, key)
                return masked_cross_entropy(out, g.y, g.train_mask)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            params2, opt_state2 = opt.step_gnn_only(params, grads, opt_state)
            t = temperature_at(epoch, max_epoch, cfg.t_init, cfg.t_min)
            return params2, opt_state2, StepMetrics(loss, t, jnp.zeros(()),
                                                    jnp.zeros(()), jnp.zeros(()))

        t = temperature_at(epoch, max_epoch, cfg.t_init, cfg.t_min)
        (loss, (gate, lf1, rf1)), grads = jax.value_and_grad(
            learned_loss, has_aux=True)(params, g, key)
        params2, opt_state2 = opt.step_learned(params, grads, opt_state, gate)
        return params2, opt_state2, StepMetrics(
            loss, t, gate.astype(jnp.float32), lf1, rf1)

    baseline_loss = make_baseline_loss(cfg, model, q, force_small) \
        if mode != "learned" else None

    def baseline_step(params, opt_state, g: Graph, epoch, key):
        """random / edge / full modes (reference training_hybrid.py:149-180):
        single forward on a (possibly sampled) subgraph, CE loss, third
        optimizer with weight decay."""
        loss, grads = jax.value_and_grad(baseline_loss)(params, g, key)
        params2, opt_state2 = opt.step_all(params, grads, opt_state)
        t = temperature_at(epoch, max_epoch, cfg.t_init, cfg.t_min)
        return params2, opt_state2, StepMetrics(loss, t, jnp.zeros(()),
                                                jnp.zeros(()), jnp.zeros(()))

    step = learned_step if mode == "learned" else baseline_step
    return jax.jit(step, donate_argnums=(0, 1) if cfg.donate else ())


def make_scan_epoch_step(cfg: Config, model, opt: DualOptimizer, q: int,
                         max_epoch: int, n_batches: int):
    """Whole-epoch train step: lax.scan over STACKED partition batches.

    The sequential driver dispatches one jit call per cluster batch — at
    Reddit scale that is 100+ host->device round trips per epoch, each
    paying remote-tunnel dispatch latency and pytree flattening (measured
    ~2.7 s of a 7.9 s epoch, logs/reddit_scale_tpu.log r4). This step
    runs the SAME per-batch update (identical per-batch PRNG keys, same
    shuffled order, one optimizer update per batch — the reference's
    schedule, main.py:57-67) as a device-side scan: ONE dispatch per
    epoch.

    Mixed fleets are handled by a per-batch lax.switch over the same
    three cases the dispatch loop distinguishes on host (``actions``
    int32[n_batches]): 0 = skip (no train nodes), 1 = small path (valid
    edges <= q — the reference's dynamic `batch.edge_index.shape[1] > q`
    branch: full-graph CE with the gnn optimizer in learned mode, full
    forward with the third optimizer in baseline modes), 2 = big sampled
    path. All three branches compile once into the scan body.

    Serves EVERY mode: learned runs the pipeline loss + gated dual-Adam;
    random/edge/full run the single-forward baseline loss + step_all
    (reference training_hybrid.py:149-180) — so baseline-mode runs at
    100+ partitions no longer pay the per-batch dispatch tax either
    (parity: tests/test_train.py::test_scan_epoch_baseline_matches_loop).

    Shape classes (data/partition.py shape_classes): the driver may pad
    partitions to 2-3 shape classes instead of one global max and run one
    scan PER CLASS per epoch. ``stacked``/``order``/``actions`` are then
    class-local, and ``gids`` maps local slots to GLOBAL batch ids so the
    per-batch PRNG key schedule (fold_in(run_key, epoch*n_batches+gid+1))
    is identical however batches are classed.

    Signature:
        epoch_step(params, opt_state, stacked, order, actions, gids,
                   epoch, run_key)
            -> (params, opt_state, (loss_sum, cond_sum, temperature))
    where ``stacked`` is stack_batches(batches-of-one-class), ``order``
    the epoch's int32 local permutation, and ``gids`` the local->global
    batch id map (arange(n_batches) when unclassed).
    """
    if cfg.mode == "learned":

        def big_case(params, opt_state, g, k):
            # q clamped to the class's padded edge count at trace time: a
            # shape class padded BELOW q holds only small/skip batches, so
            # its big branch is dead — but lax.switch still traces it, and
            # top_k(k=q) over fewer keys would fail the trace
            learned_loss = make_learned_loss(cfg, model,
                                             min(q, g.senders.shape[0]))
            (loss, (gate, _, _)), grads = jax.value_and_grad(
                learned_loss, has_aux=True)(params, g, k)
            params2, opt_state2 = opt.step_learned(params, grads,
                                                   opt_state, gate)
            return params2, opt_state2, loss, gate.astype(jnp.float32)

        def small_case(params, opt_state, g, k):
            def ce(p):
                out = _apply_gnn(model, p, g.x, g.senders, g.receivers,
                                 None, k)
                return masked_cross_entropy(out, g.y, g.train_mask)
            loss, grads = jax.value_and_grad(ce)(params)
            params2, opt_state2 = opt.step_gnn_only(params, grads,
                                                    opt_state)
            return params2, opt_state2, loss, jnp.zeros(())
    else:
        base_big = make_baseline_loss(cfg, model, q)
        base_small = make_baseline_loss(cfg, model, q, force_small=True)

        def _baseline_case(loss_fn):
            def case(params, opt_state, g, k):
                loss, grads = jax.value_and_grad(loss_fn)(params, g, k)
                params2, opt_state2 = opt.step_all(params, grads,
                                                   opt_state)
                return params2, opt_state2, loss, jnp.zeros(())
            return case

        big_case = _baseline_case(base_big)
        small_case = _baseline_case(base_small)

    def skip_case(params, opt_state, g, k):
        return params, opt_state, jnp.zeros(()), jnp.zeros(())

    def epoch_step(params, opt_state, stacked, order, actions, gids,
                   epoch, run_key):
        t = temperature_at(epoch, max_epoch, cfg.t_init, cfg.t_min)

        def body(carry, i):
            params, opt_state, loss_acc, cond_acc = carry
            bi = order[i]
            g = jax.tree_util.tree_map(lambda a: a[bi], stacked)
            # identical key schedule to the per-batch loop
            # (run/driver.py: fold_in(run_key, epoch*n_batches + gid + 1))
            k = jax.random.fold_in(run_key,
                                   epoch * n_batches + gids[bi] + 1)
            params2, opt_state2, loss, cond = jax.lax.switch(
                actions[bi], (skip_case, small_case, big_case),
                params, opt_state, g, k)
            return (params2, opt_state2, loss_acc + loss,
                    cond_acc + cond), ()

        init = (params, opt_state, jnp.zeros(()), jnp.zeros(()))
        (params, opt_state, loss_acc, cond_acc), _ = jax.lax.scan(
            body, init, jnp.arange(order.shape[0]))
        return params, opt_state, (loss_acc, cond_acc, t)

    return jax.jit(epoch_step,
                   donate_argnums=(0, 1) if cfg.donate else ())
