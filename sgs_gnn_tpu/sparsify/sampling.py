"""Learned edge sampling with straight-through gradients.

TPU-native re-design of the reference sampler (reference sampling.py:91-155,
named `gumbel_softmax_sampling` though the live code is multinomial +
straight-through). Semantics preserved exactly; mechanics differ:

  * `torch.multinomial(p, q, replacement=False)` -> Gumbel-top-k over log p
    (distributionally identical, O(E) + XLA top_k, static output shape q).
  * the boolean edge mask + gather becomes an index array of shape (q,), so
    the sampled subgraph has a static shape and one compiled step serves
    every draw.

Straight-through estimator (reference sampling.py:134-138): for a selected
edge e the returned weight has value edge_probs[e] (the ST multiplier is
one_hot=1 there) but gradient
    d w_e = straight_through[e] * d edge_probs[e]
          + edge_probs[e] * d samples[e]
so gradients flow through the *sampling distribution* as well — this is what
the straight_through pipeline trains through.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.sampling_ops import gumbel_topk, uniform_topk

_EPS = 1e-12


def _normalized(edge_probs, edge_mask):
    if edge_mask is not None:
        edge_probs = jnp.where(edge_mask, edge_probs, 0.0)
    return edge_probs / (jnp.sum(edge_probs) + _EPS)


def sample_edges(key, edge_probs, prior, q: int, degree_bias_coef: float,
                 istest: bool = False,
                 edge_mask: Optional[jax.Array] = None,
                 approx: bool = False, bf16: bool = True,
                 ) -> Tuple[jax.Array, jax.Array]:
    """Sample q edge indices ~ learned distribution; return (idx, st_weights).

    Training draws mix the learned distribution with the degree/ER prior:
    ``(1-beta) p/sum(p) + beta prior`` (reference sampling.py:93-95); test
    draws (istest=True) skip the mixing. Weights carry the straight-through
    gradient path described in the module docstring.
    """
    samples = _normalized(edge_probs, edge_mask)
    if not istest:
        prior_ = jnp.where(edge_mask, prior, 0.0) if edge_mask is not None else prior
        samples = (1.0 - degree_bias_coef) * samples + degree_bias_coef * prior_
    idx = gumbel_topk(key, jax.lax.stop_gradient(samples), q, mask=edge_mask,
                      approx=approx, bf16=bf16)
    sel = samples[idx]
    straight_through = jax.lax.stop_gradient(1.0 - sel) + sel
    weights = jnp.clip(edge_probs[idx] * straight_through, 0.0, 1.0)
    return idx, weights


def sample_prior_edges(key, prior, q: int,
                       edge_mask: Optional[jax.Array] = None,
                       approx: bool = False, bf16: bool = True) -> jax.Array:
    """Sample q edges ~ softmax(prior) — the reference's 'edge' mode and the
    conditional gate's random subgraph (training_hybrid.py:45-48, 163-166)."""
    if edge_mask is not None:
        logits = jnp.where(edge_mask, prior, -jnp.inf)
    else:
        logits = prior
    p = jax.nn.softmax(logits)
    return gumbel_topk(key, p, q, mask=edge_mask, approx=approx, bf16=bf16)


def random_edges(key, num_edges: int, q: int,
                 edge_mask: Optional[jax.Array] = None,
                 approx: bool = False, bf16: bool = True) -> jax.Array:
    """Uniform q-subset (reference random_edge_sampling, sampling.py:159-163)."""
    return uniform_topk(key, num_edges, q, mask=edge_mask, approx=approx,
                        bf16=bf16)


def temperature_at(epoch, max_epoch: int, t_init: float, t_min: float):
    """Linear annealing ``max(t_min, t_init - epoch*(t_init-t_min)/max_epoch)``
    (reference training_hybrid.py:67-70). The live sampler does not consume
    the temperature (the Gumbel-softmax branch is commented out in the
    reference), but the schedule is tracked and checkpointed for parity
    (reference main.py:233)."""
    r = (t_init - t_min) / max_epoch
    return jnp.maximum(t_min, t_init - epoch * r)
