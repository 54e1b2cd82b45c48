"""Sampling primitives: weighted sampling without replacement on TPU.

The reference samples q edges per step with
``torch.multinomial(samples, q, replacement=False)`` — a CUDA kernel
(reference sampling.py:96). The TPU-native equivalent is the Gumbel-top-k
trick: adding i.i.d. Gumbel noise to the log-probabilities and taking the
top-q indices draws exactly a without-replacement sample from the same
distribution (equivalently: keys u_i^(1/p_i) with uniform u — the
Efraimidis-Spirakis estimator). This is O(E) work + an XLA top_k, static
shapes, no host sync.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-30


def gumbel_topk(key, probs, q: int, mask=None):
    """Sample q indices without replacement proportionally to ``probs``.

    probs need not be normalized. ``mask=False`` entries are never sampled
    (used for padded edges). Returns int32 indices of shape (q,).
    """
    logp = jnp.log(jnp.maximum(probs, _TINY))
    gumbel = jax.random.gumbel(key, probs.shape, dtype=logp.dtype)
    keys = logp + gumbel
    if mask is not None:
        keys = jnp.where(mask, keys, -jnp.inf)
    _, idx = jax.lax.top_k(keys, q)
    return idx.astype(jnp.int32)


def uniform_topk(key, num_items: int, q: int, mask=None):
    """Uniformly sample q of ``num_items`` without replacement
    (reference ``random_edge_sampling``: randperm(E)[:q], sampling.py:159-163).
    """
    keys = jax.random.uniform(key, (num_items,))
    if mask is not None:
        keys = jnp.where(mask, keys, -jnp.inf)
    _, idx = jax.lax.top_k(keys, q)
    return idx.astype(jnp.int32)
