"""Segment reductions — the TPU-native replacement for torch_scatter.

The reference's neighborhood aggregation bottoms out in torch_scatter /
PyG segment CSR CUDA kernels (inside GCNConv/GATConv/GIN/Cheb, reference
model.py:5; and `scatter` for ogbn-proteins feature init, datasets.py:86).
Here they are expressed as `jax.ops.segment_*` with static segment counts so
XLA lowers them to sorted-scatter on TPU; hot paths go through the Pallas
SpMM in ops/spmm.py instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int):
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    cnt = jax.ops.segment_sum(jnp.ones(segment_ids.shape[0], dtype=data.dtype),
                              segment_ids, num_segments=num_segments)
    return s / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(logits, segment_ids, num_segments: int):
    """Numerically-stable softmax over edges grouped by destination node.

    Used for GAT attention (the reference gets this from PyG `softmax`
    inside GATConv). Returns one weight per edge.
    """
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)
