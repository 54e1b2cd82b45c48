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

import os

import jax
import jax.numpy as jnp

_TINY = 1e-30


def _select_topk(keys, q: int, approx: bool, recall: float,
                 bf16: bool = True):
    if approx:
        # TPU-optimized partial reduction (jax.lax.approx_max_k) — ~5x
        # faster than exact top_k at E=1M. For *stochastic* key vectors the
        # missed tail entries (recall_target ~0.97) are statistically
        # indistinguishable from the sampling noise itself.
        if (bf16 and jax.default_backend() == "tpu"
                and keys.dtype == jnp.float32
                and os.environ.get("SGS_TOPK_BF16", "on") != "off"):
            # bf16 keys halve the HBM traffic of the reduction; rounding
            # perturbs each Gumbel key by <0.4%, far inside the sampling
            # noise the approx reduction already accepts (-inf masking is
            # exactly representable). Surfaced as Config.topk_bf16 /
            # --topk_bf16 and reported by log_fastpath_status;
            # SGS_TOPK_BF16=off is the env kill-switch.
            keys = keys.astype(jnp.bfloat16)
        _, idx = jax.lax.approx_max_k(keys, q, recall_target=recall)
    else:
        _, idx = jax.lax.top_k(keys, q)
    return idx.astype(jnp.int32)


def gumbel_topk(key, probs, q: int, mask=None, approx: bool = False,
                recall: float = 0.97, bf16: bool = True):
    """Sample q indices without replacement proportionally to ``probs``.

    probs need not be normalized. ``mask=False`` entries are never sampled
    (used for padded edges). Returns int32 indices of shape (q,).
    ``approx=True`` uses the TPU approx_max_k kernel (see _select_topk);
    ``bf16`` gates its bf16-key fast path (Config.topk_bf16).
    """
    logp = jnp.log(jnp.maximum(probs, _TINY))
    gumbel = jax.random.gumbel(key, probs.shape, dtype=logp.dtype)
    keys = logp + gumbel
    if mask is not None:
        keys = jnp.where(mask, keys, -jnp.inf)
    return _select_topk(keys, q, approx, recall, bf16)


def uniform_topk(key, num_items: int, q: int, mask=None,
                 approx: bool = False, recall: float = 0.97,
                 bf16: bool = True):
    """Uniformly sample q of ``num_items`` without replacement
    (reference ``random_edge_sampling``: randperm(E)[:q], sampling.py:159-163).
    """
    keys = jax.random.uniform(key, (num_items,))
    if mask is not None:
        keys = jnp.where(mask, keys, -jnp.inf)
    return _select_topk(keys, q, approx, recall, bf16)
