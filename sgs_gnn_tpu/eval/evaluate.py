"""Ensemble evaluation (reference evaluate.py:70-173).

The reference draws `num_samples_eval` sampled subgraphs per cluster batch,
averages the logits, and reports per-mask micro-F1 weighted by mask size
across batches. Differences in mechanics, not semantics:

  * the edge scorer runs in eval mode (no dropout) so its output is
    identical across draws — it is computed ONCE per batch here instead of
    once per draw (the reference recomputes it 11x, evaluate.py:84).
  * the draw loop is a vmap over sampling keys; logits are averaged on
    device; micro-F1 is computed on device (masked accuracy).

Returns per-split (weighted_f1_sum, count) so the host loop can aggregate
across partitions exactly like the reference (evaluate.py:152-165).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.config import Config
from ..core.graph import Graph
from ..sparsify.sampling import sample_edges, sample_prior_edges, random_edges
from ..train.losses import micro_f1


def make_eval_step(cfg: Config, model, q: int, force_small: bool = False):
    mode = cfg.mode
    n_draws = cfg.num_samples_eval

    def eval_step(params, g: Graph, key, temperature):
        e = g.num_edges

        def forward(s, r, w):
            return model.apply(params, g.x, s, r, w, deterministic=True)

        if mode == "full" or force_small or e <= q:
            logits = forward(g.senders, g.receivers, None)
        elif mode == "learned":
            # deterministic scorer -> score once; full-graph propagation
            # (reference evaluate.py:84 calls the scorer without the random
            # subgraph during eval)
            probs = model.apply(params, g.x, g.senders, g.receivers,
                                g.senders, g.receivers, True, False,
                                method="score_edges")

            def draw(k):
                idx, w = sample_edges(k, probs, g.prob, q,
                                      cfg.degree_bias_coef, istest=True,
                                      edge_mask=g.edge_mask,
                                      approx=cfg.approx_topk, bf16=cfg.topk_bf16)
                return forward(g.senders[idx], g.receivers[idx], w)

            logits = jnp.mean(
                jax.vmap(draw)(jax.random.split(key, n_draws)), axis=0)
        elif mode == "random":
            def draw(k):
                idx = random_edges(k, e, q, edge_mask=g.edge_mask,
                                   approx=cfg.approx_topk, bf16=cfg.topk_bf16)
                return forward(g.senders[idx], g.receivers[idx], None)
            logits = jnp.mean(
                jax.vmap(draw)(jax.random.split(key, n_draws)), axis=0)
        elif mode == "edge":
            def draw(k):
                idx = sample_prior_edges(k, g.prob, q, edge_mask=g.edge_mask,
                                         approx=cfg.approx_topk, bf16=cfg.topk_bf16)
                return forward(g.senders[idx], g.receivers[idx], None)
            logits = jnp.mean(
                jax.vmap(draw)(jax.random.split(key, n_draws)), axis=0)
        else:
            raise ValueError(mode)

        out: Dict[str, jax.Array] = {}
        for split, mask in (("train", g.train_mask), ("val", g.val_mask),
                            ("test", g.test_mask)):
            cnt = jnp.sum(mask.astype(jnp.float32))
            f1 = micro_f1(logits, g.y, mask)
            out[f"{split}_f1_weighted"] = f1 * cnt
            out[f"{split}_count"] = cnt
        return out

    return jax.jit(eval_step)


def make_scan_eval_step(cfg: Config, model, q: int):
    """Whole-fleet ensemble eval as ONE device-side lax.scan over stacked
    partition batches (companion of train.make_scan_epoch_step): the
    per-batch eval dispatches collapse into a single call returning the
    summed weighted-F1 dict. Key schedule matches the per-batch loop
    (run/driver.py passes the SAME epoch key to every batch); the
    per-batch big/small decision (valid edges > q) arrives as
    ``small_flags`` int32[n_batches] and selects via lax.cond, exactly
    like the loop's ev_big/ev_small dispatch."""
    inner_big = make_eval_step(cfg, model, q)
    inner_small = make_eval_step(cfg, model, q, force_small=True)

    def scan_eval(params, stacked, small_flags, key, temperature):
        def body(acc, bi):
            g = jax.tree_util.tree_map(lambda a: a[bi], stacked)
            res = jax.lax.cond(small_flags[bi] > 0, inner_small, inner_big,
                               params, g, key, temperature)
            return jax.tree_util.tree_map(jnp.add, acc, res), ()

        zeros = {f"{s}_{k}": jnp.zeros(())
                 for s in ("train", "val", "test")
                 for k in ("f1_weighted", "count")}
        acc, _ = jax.lax.scan(body, zeros,
                              jnp.arange(small_flags.shape[0]))
        return acc

    return jax.jit(scan_eval)


def aggregate_eval(batch_results) -> Dict[str, float]:
    """Weighted-mean F1 across partition batches (reference
    evaluate.py:169-172). One device_get moves every pending result in a
    single transfer — callers may pass live device dicts without paying a
    blocking readback per batch (the reference syncs 6 floats per partition
    per epoch; at Reddit scale that is ~170k blocking readbacks per run)."""
    batch_results = jax.device_get(batch_results)
    out = {}
    for split in ("train", "val", "test"):
        tot = sum(float(r[f"{split}_f1_weighted"]) for r in batch_results)
        cnt = sum(float(r[f"{split}_count"]) for r in batch_results)
        out[f"{split}_f1"] = tot / cnt if cnt > 0 else 0.0
    return out


def accumulate_eval_device(acc, result):
    """Device-side running sum of eval_step result dicts (weighted F1 sums
    and counts are additive across partitions): the per-epoch eval loop
    stays enqueue-only, with ONE host transfer in aggregate_eval."""
    if acc is None:
        return result
    return jax.tree_util.tree_map(jnp.add, acc, result)
