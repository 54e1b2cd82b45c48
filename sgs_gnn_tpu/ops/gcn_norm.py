"""GCN symmetric normalization with self-loops.

Replicates the semantics of PyG's ``gcn_norm`` (used by GCNConv in the
reference backbone, model.py:151-161, and the EdgeProbGCN scorer encoder,
model.py:94-95): append self-loops with weight 1, compute
``D^{-1/2} (A + I) D^{-1/2}`` where the degree is the weighted in-degree.

Two forms:

  * ``gcn_norm`` — returns concatenated (E+N)-edge arrays; kept for callers
    that want explicit self-loop edges (ChebConv uses add_loops=False).
  * ``gcn_norm_terms`` — TPU-first form: never materializes the E+N concat.
    Self-loop contributions are diagonal, so the caller adds them
    analytically:  out = spmm(s, r, norm, x) + loop_coef[:, None] * x.
    The degree reduction routes through the Pallas scalar segment-sum on
    TPU (ops/scatter_pallas.segment_sum_scalar) — the XLA scalar scatter is
    ~4.5 ms at 200k edges, the kernel ~10x less.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .scatter_pallas import segment_sum_scalar


def add_self_loops(senders, receivers, weights, num_nodes: int,
                   fill_value: float = 1.0):
    loop = jnp.arange(num_nodes, dtype=senders.dtype)
    senders = jnp.concatenate([senders, loop])
    receivers = jnp.concatenate([receivers, loop])
    loop_w = jnp.full((num_nodes,), fill_value, dtype=weights.dtype)
    weights = jnp.concatenate([weights, loop_w])
    return senders, receivers, weights


def gcn_norm_terms(senders, receivers, weights, num_nodes: int,
                   fill_value: float = 1.0):
    """Sym normalization without materializing self-loop edges.

    Returns ``(norm, loop_coef)``:
      norm[e]      = d^{-1/2}[senders[e]] * w[e] * d^{-1/2}[receivers[e]]
      loop_coef[n] = d^{-1/2}[n] * fill_value * d^{-1/2}[n]
    with d = weighted in-degree + fill_value (the self-loop's own weight).
    Zero-degree nodes get coefficient 0 (PyG masked_fill semantics).
    """
    if weights is None:
        weights = jnp.ones(senders.shape[0], dtype=jnp.float32)
    deg = segment_sum_scalar(weights, receivers, num_nodes) + fill_value
    deg_inv_sqrt = jnp.where(deg > 0,
                             jax.lax.rsqrt(jnp.maximum(deg, 1e-32)), 0.0)
    norm = deg_inv_sqrt[senders] * weights * deg_inv_sqrt[receivers]
    loop_coef = deg_inv_sqrt * deg_inv_sqrt * fill_value
    return norm, loop_coef


def gcn_norm(senders, receivers, weights, num_nodes: int,
             add_loops: bool = True):
    """Returns (senders', receivers', norm_weights') with sym normalization.

    weights=None means unweighted (ones). Zero-degree nodes get coefficient 0
    (PyG's ``deg_inv_sqrt.masked_fill_(inf, 0)``).
    """
    if weights is None:
        weights = jnp.ones(senders.shape[0], dtype=jnp.float32)
    if add_loops:
        senders, receivers, weights = add_self_loops(
            senders, receivers, weights, num_nodes)
    deg = segment_sum_scalar(weights, receivers, num_nodes)
    deg_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-32)), 0.0)
    norm = deg_inv_sqrt[senders] * weights * deg_inv_sqrt[receivers]
    return senders, receivers, norm
