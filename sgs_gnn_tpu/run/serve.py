"""Serving API: the "graph sparsifier" product surface.

The reference has no inference entry point — its deployment artifact is a
saved state_dict + best temperature, and inference is a re-run of
ensemble_evaluate (reference main.py:264-270, SURVEY.md section 3.4). This
module exposes the two operations a user of a trained SGS-GNN actually
wants:

  * ``sparsify`` — score all edges and draw a q-edge sparse subgraph
    (edge indices + differentiable-path weights): the sparsifier product
    (reference README.md:5).
  * ``predict``  — ensemble-averaged class logits / labels on the sampled
    subgraphs, i.e. ensemble_evaluate without the metric plumbing.

Both are jitted, static-shape, and take an explicit PRNG key.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import Config
from ..core.graph import Graph
from ..sparsify.sampling import sample_edges


class SparsifiedGraph(NamedTuple):
    senders: jax.Array     # (q,)
    receivers: jax.Array   # (q,)
    weights: jax.Array     # (q,) learned edge probabilities of kept edges
    edge_ids: jax.Array    # (q,) indices into the original edge list
    probs: jax.Array       # (E,) full learned edge-probability vector


def make_sparsifier(cfg: Config, model, q: int):
    """Returns ``sparsify(params, graph, key) -> SparsifiedGraph``."""

    @jax.jit
    def sparsify(params, g: Graph, key):
        probs = model.apply(params, g.x, g.senders, g.receivers,
                            g.senders, g.receivers, True, False,
                            method="score_edges")
        idx, w = sample_edges(key, probs, g.prob, q, cfg.degree_bias_coef,
                              istest=True, edge_mask=g.edge_mask,
                              approx=cfg.approx_topk)
        return SparsifiedGraph(senders=g.senders[idx],
                               receivers=g.receivers[idx],
                               weights=w, edge_ids=idx, probs=probs)

    return sparsify


def make_predictor(cfg: Config, model, q: int):
    """Returns ``predict(params, graph, key) -> (logits, labels)`` using the
    same ensemble scheme as evaluation (cfg.num_samples_eval draws,
    logits averaged; reference evaluate.py:81-149)."""
    n_draws = cfg.num_samples_eval

    @jax.jit
    def predict(params, g: Graph, key):
        if g.num_edges <= q or cfg.mode == "full":
            logits = model.apply(params, g.x, g.senders, g.receivers,
                                 deterministic=True)
            return logits, jnp.argmax(logits, axis=-1)
        probs = model.apply(params, g.x, g.senders, g.receivers,
                            g.senders, g.receivers, True, False,
                            method="score_edges")

        def draw(k):
            idx, w = sample_edges(k, probs, g.prob, q, cfg.degree_bias_coef,
                                  istest=True, edge_mask=g.edge_mask,
                                  approx=cfg.approx_topk)
            return model.apply(params, g.x, g.senders[idx], g.receivers[idx],
                               w, deterministic=True)

        logits = jnp.mean(jax.vmap(draw)(jax.random.split(key, n_draws)),
                          axis=0)
        return logits, jnp.argmax(logits, axis=-1)

    return predict
