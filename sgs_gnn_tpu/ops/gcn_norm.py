"""GCN symmetric normalization with self-loops.

Replicates the semantics of PyG's ``gcn_norm`` (used by GCNConv in the
reference backbone, model.py:151-161, and the EdgeProbGCN scorer encoder,
model.py:94-95): append self-loops with weight 1, compute
``D^{-1/2} (A + I) D^{-1/2}`` where the degree is the weighted in-degree.

All shapes are static: appending N self-loops to E edges yields E+N edges.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def add_self_loops(senders, receivers, weights, num_nodes: int,
                   fill_value: float = 1.0):
    loop = jnp.arange(num_nodes, dtype=senders.dtype)
    senders = jnp.concatenate([senders, loop])
    receivers = jnp.concatenate([receivers, loop])
    loop_w = jnp.full((num_nodes,), fill_value, dtype=weights.dtype)
    weights = jnp.concatenate([weights, loop_w])
    return senders, receivers, weights


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
    deg = jax.ops.segment_sum(weights, receivers, num_segments=num_nodes)
    deg_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-32)), 0.0)
    norm = deg_inv_sqrt[senders] * weights * deg_inv_sqrt[receivers]
    return senders, receivers, norm
