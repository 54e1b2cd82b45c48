"""NeuralSparse baseline: k-per-node Gumbel top-k sparsification.

TPU-native re-implementation of the reference's comparison baseline
(reference Notebooks/1KDDNeuralSparseoptimized.ipynb: `GumbleGCN`,
`get_neuralsparse_edge_scores`, `select_topk_per_node`): an MLP scores each
edge from its endpoint features, Gumbel noise is added, and each node keeps
its top-k incoming edges; a GCN trains on the masked graph with
straight-through gradients.

Per-node top-k with static shapes: rank every edge within its receiver's
segment by sorting on a composite key (receiver-major, score-descending)
and keep rank < k — one O(E log E) sort, no per-node loops.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.layers import GCNConv


def per_node_topk_mask(scores, receivers, num_nodes: int, k: int):
    """Boolean mask keeping each receiver's k highest-scoring edges.

    Sorting by (receiver asc, score desc) makes each segment contiguous in
    descending score order; an edge's rank inside its segment is its sorted
    position minus the segment start.
    """
    e = scores.shape[0]
    order = jnp.lexsort((-scores, receivers))
    sorted_recv = receivers[order]
    pos = jnp.arange(e)
    # segment start at each sorted position = first index with this receiver
    is_start = jnp.concatenate([jnp.ones(1, bool),
                                sorted_recv[1:] != sorted_recv[:-1]])
    seg_start = jnp.where(is_start, pos, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = pos - seg_start
    keep_sorted = rank < k
    keep = jnp.zeros(e, bool).at[order].set(keep_sorted)
    return keep


class NeuralSparseGCN(nn.Module):
    """Edge-scoring MLP + k-per-node Gumbel selection + 2-layer GCN."""
    hidden_dim: int
    num_classes: int
    k: int = 5
    dropout_prob: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, senders, receivers, key, temperature: float = 1.0,
                 deterministic: bool = True):
        n = x.shape[0]
        hu = nn.Dense(self.hidden_dim, name="score_proj",
                      dtype=self.dtype)(x)
        feats = jnp.concatenate([hu[senders], hu[receivers]], axis=-1)
        logits = nn.Dense(1, name="score_out",
                          dtype=self.dtype)(nn.relu(feats))[:, 0]
        logits = logits.astype(jnp.float32)
        gumbel = jax.random.gumbel(key, logits.shape)
        noisy = (logits + gumbel) / temperature
        keep = per_node_topk_mask(noisy, receivers, n, self.k)
        soft = jax.nn.sigmoid(noisy)
        # straight-through: hard 0/1 mask forward, soft sigmoid backward
        w = jax.lax.stop_gradient(keep.astype(jnp.float32) - soft) + soft
        h = nn.relu(GCNConv(self.hidden_dim, dtype=self.dtype,
                            name="gcn1")(x, senders, receivers, w))
        h = nn.Dropout(self.dropout_prob, deterministic=deterministic)(h)
        return GCNConv(self.num_classes, dtype=self.dtype,
                       name="gcn2")(h, senders, receivers, w)
